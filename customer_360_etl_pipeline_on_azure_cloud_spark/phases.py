"""Opt-in phase timing for composite queries (VERDICT r5 item 5).

Several registered queries deliberately time an in-query index BUILD
plus the recurring PROBE (the honest end-to-end demo) — but the probe
is the daily cost a user actually pays against a standing index, and it
was invisible inside the single bench number.  Query functions mark
their eager build sections with ``with phase("build"):``; when a sink
is installed (bench.py does, the driver contract does not), the elapsed
time accumulates there, and the bench reports ``build`` and
``probe = total - build`` per composite query.

No sink installed (the default) = zero behavior change: the context
manager is a pass-through.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

_sink: dict[str, float] | None = None


def capture(sink: dict[str, float] | None) -> None:
    """Install (or with ``None`` remove) the accumulation sink."""
    global _sink
    _sink = sink


@contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if _sink is not None:
            _sink[name] = _sink.get(name, 0.0) + (time.perf_counter() - t0)
