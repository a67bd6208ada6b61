from .scalar import (
    argmax_label,
    bucketize,
    conditional_concat,
    money_cents,
    recode,
    row_sum,
)

__all__ = [
    "argmax_label",
    "bucketize",
    "conditional_concat",
    "money_cents",
    "recode",
    "row_sum",
]
