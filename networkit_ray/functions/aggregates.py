"""Custom Ray Data aggregates.

``ArgMaxWMinLabel`` powers the synchronous-PLP argmax (SURVEY.md §2.1.3):
per group (one vertex), pick the label with the maximum summed weight,
breaking ties toward the smallest label id.  The accumulator (best_w,
best_label) is associative/commutative, so Ray can pre-combine per block
and merge partials — no per-group Python sort, no map_groups.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor


def _better(a: tuple | None, b: tuple | None):
    """Max by w, ties -> min label. None = identity."""
    if a is None:
        return b
    if b is None:
        return a
    if b[0] > a[0] or (b[0] == a[0] and b[1] < a[1]):
        return b
    return a


class ArgMaxWMinLabel(AggregateFnV2):
    def __init__(
        self,
        w_col: str = "w",
        label_col: str = "label",
        alias_name: str = "label",
    ):
        self._w_col = w_col
        self._label_col = label_col
        # on=None: aggregate over whole rows — declaring a single target
        # column would let Ray project away the label column before
        # aggregate_block sees it
        super().__init__(
            alias_name, zero_factory=lambda: None, on=None, ignore_nulls=True
        )

    def aggregate_block(self, block: Block):
        t = BlockAccessor.for_block(block).to_arrow()
        if t.num_rows == 0:
            return None
        w = t[self._w_col].to_numpy(zero_copy_only=False)
        lab = t[self._label_col].to_numpy(zero_copy_only=False)
        mx = w.max()
        return (float(mx), int(lab[w == mx].min()))

    def combine(self, current, new):
        return _better(current, new)

    def finalize(self, accumulator):
        return None if accumulator is None else accumulator[1]
