"""r10: the IVFPQ distributed build's shared normalize+assign+residual
pass (operators/similarity _ivfpq_assign_resid).

The distributed codebook fit and the encode step each used to re-scan
the raw corpus to recompute EXACTLY the same (L2-normalize -> coarse
argmin -> residual) values; the build now computes that pass once,
persists it, and both consumers read it.  Because the stored residual
is the same float64 the independent passes produced, every downstream
number must be BIT-identical — these pins turn that claim into tests:

* codebooks from ``prepared_resid`` == codebooks from the corpus
  re-scan (exact ``np.array_equal``, every subspace);
* codes from ``assigned`` == codes from the corpus re-scan (row-exact);
* the cell column of the shared pass == the encode pass's own argmin.

The end-to-end lifecycle (write_ivfpq_index -> indexed probe equals the
in-line construction) is already pinned in test_extensions.py and runs
through the new path by default.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_SMALL

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (
    _ivfpq_assign_resid,
    _ivfpq_encode,
    _ivfpq_fit,
    pq_codebooks_distributed,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.sources.tables import (
    load_table,
)


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").cache()


def test_shared_assign_bit_identical_books_and_codes(emb):
    cents, books, assigned = _ivfpq_fit(
        emb, 8, 4, 8, 2000, "vec_id", "embedding",
        codebook_fit="distributed", return_assigned=True,
    )
    try:
        # 1. codebooks: prepared_resid path (what the fit used) vs the
        #    original corpus re-scan path — exact equality
        books_rescan = pq_codebooks_distributed(
            emb, 4, 8, id_col="vec_id", vec_col="embedding",
            coarse_cents=cents, iters=3,
        )
        assert books.shape == books_rescan.shape
        assert np.array_equal(books, books_rescan)

        # 2. codes: assigned-reuse encode vs corpus re-scan encode —
        #    row-exact (cell, id, every code)
        via_assigned = sorted(
            (r["cell"], r["neighbor_id"], tuple(r["codes"]))
            for r in _ivfpq_encode(
                emb, cents, books, "vec_id", "embedding", assigned=assigned
            ).collect()
        )
        via_rescan = sorted(
            (r["cell"], r["neighbor_id"], tuple(r["codes"]))
            for r in _ivfpq_encode(
                emb, cents, books, "vec_id", "embedding"
            ).collect()
        )
        assert via_assigned == via_rescan
        assert len(via_assigned) == emb.count()
    finally:
        assigned.unpersist()


def test_sample_fit_returns_no_assigned_frame(emb):
    cents, books, assigned = _ivfpq_fit(
        emb, 8, 4, 8, 2000, "vec_id", "embedding",
        codebook_fit="sample", return_assigned=True,
    )
    assert assigned is None
    assert cents.shape[0] == 8 and books.shape == (4, 8, books.shape[2])
    # legacy 2-tuple shape preserved for existing callers
    pair = _ivfpq_fit(
        emb, 8, 4, 8, 2000, "vec_id", "embedding", codebook_fit="sample"
    )
    assert len(pair) == 2


def test_assign_resid_cell_matches_encode_argmin(emb):
    cents, books = _ivfpq_fit(
        emb, 8, 4, 8, 2000, "vec_id", "embedding", codebook_fit="sample"
    )
    cells_shared = {
        r["id"]: r["cell"]
        for r in _ivfpq_assign_resid(emb, cents, "vec_id", "embedding").collect()
    }
    cells_encode = {
        r["neighbor_id"]: r["cell"]
        for r in _ivfpq_encode(emb, cents, books, "vec_id", "embedding").collect()
    }
    assert cells_shared == cells_encode
