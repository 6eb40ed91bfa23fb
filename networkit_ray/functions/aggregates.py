"""Custom Ray Data aggregates.

``ArgMaxWMinLabel`` powers the synchronous-PLP argmax (SURVEY.md §2.1.3):
per group (one vertex), pick the label with the maximum summed weight,
breaking ties toward the smallest label id.  The accumulator (best_w,
best_label) is associative/commutative, so Ray can pre-combine per block
and merge partials — no per-group Python sort, no map_groups.

``ApproxDistinct`` is the HyperLogLog distinct-count sketch as a native
Ray aggregate: the accumulator is a fixed 2^p-byte register array whose
merge is an elementwise max — Ray pre-combines per block and ships only
sketch bytes through the shuffle, so counting distinct keys over 100 TB
moves O(partitions x 2^p) bytes instead of the keys themselves.  Standard
error ~= 1.04/sqrt(2^p).  (Flajolet et al. 2007; the reference catalog's
sketch-aggregate family.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


class ApproxDistinct(AggregateFnV2):
    """HyperLogLog approximate COUNT(DISTINCT col).

    Accumulator: bytes of a uint8[2^p] register array (max rank per
    bucket); merge = elementwise max; finalize = the standard HLL harmonic
    estimator with small/large-range corrections."""

    def __init__(self, col: str, p: int = 12, alias_name: str | None = None):
        self._col = col
        self._p = p
        self._m = 1 << p
        super().__init__(
            alias_name or f"approx_distinct({col})",
            zero_factory=lambda: None,
            on=None,
            ignore_nulls=True,
        )

    def _sketch(self, values: np.ndarray) -> bytes:
        h = pd.util.hash_array(values)
        idx = (h >> np.uint64(64 - self._p)).astype(np.int64)
        rest = h << np.uint64(self._p)
        # rank = leading zeros of the remaining bits + 1 (capped)
        lead = np.full(len(h), 64 - self._p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # position of highest set bit via float64 log2 (exact for the
            # power-of-two mantissa path after isolating the msb is not
            # needed: 64-bit -> float64 keeps the top 53 bits, enough to
            # locate the msb exactly)
            top = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
            lead_nz = (top + 1).astype(np.uint8)
            lead[nz] = lead_nz
        regs = np.zeros(self._m, dtype=np.uint8)
        np.maximum.at(regs, idx, lead)
        return regs.tobytes()

    def aggregate_block(self, block: Block):
        t = BlockAccessor.for_block(block).to_arrow()
        if t.num_rows == 0:
            return None
        col = t[self._col].combine_chunks()
        vals = col.drop_null()
        if len(vals) == 0:
            return None
        arr = vals.to_numpy(zero_copy_only=False)
        return self._sketch(arr)

    def combine(self, current, new):
        if current is None:
            return new
        if new is None:
            return current
        a = np.frombuffer(current, dtype=np.uint8)
        b = np.frombuffer(new, dtype=np.uint8)
        return np.maximum(a, b).tobytes()

    def finalize(self, accumulator):
        if accumulator is None:
            return 0
        regs = np.frombuffer(accumulator, dtype=np.uint8).astype(np.float64)
        m = float(self._m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-regs))
        if est <= 2.5 * m:
            zeros = float((regs == 0).sum())
            if zeros > 0:
                est = m * np.log(m / zeros)  # linear counting
        elif est > (1 << 32) / 30.0:
            est = -(2.0**64) * np.log(1.0 - est / 2.0**64)
        return int(round(est))


class BitwiseOrSketch(AggregateFnV2):
    """Fixed-width bitwise-OR union — the sketch aggregate the reference's
    ANF/HopPlot family is built on (Palmer/Gibbons/Faloutsos KDD'02:
    Flajolet–Martin bitmask union along edges), as a NATIVE Ray aggregate
    (SURVEY §2.3 `distance/` row: "sketch unions map beautifully to
    AggregateFnV2").

    ``col`` must be a fixed_size_binary column (any multiple of 8 bytes);
    the accumulator is one such value per group and merge is a single
    vectorized OR, so Ray pre-combines per block and the shuffle ships
    O(groups x width) sketch bytes, never the neighbor sets themselves."""

    def __init__(self, col: str, alias_name: str | None = None):
        self._col = col
        super().__init__(
            alias_name or f"bitor({col})",
            zero_factory=lambda: None,
            on=None,
            ignore_nulls=True,
        )

    @staticmethod
    def _matrix(arr: pa.Array) -> np.ndarray:
        """binary Array (fixed_size_binary, or [large_]binary of uniform
        width, e.g. the aggregate's own bytes output) -> (n, width/8)
        uint64 view — zero-copy modulo the arrow offset slice."""
        if len(arr) == 0:
            return np.zeros((0, 0), dtype=np.uint64)
        if pa.types.is_fixed_size_binary(arr.type):
            width = arr.type.byte_width
            data = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
            data = data[arr.offset * width : (arr.offset + len(arr)) * width]
        else:
            odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            off = np.frombuffer(arr.buffers()[1], dtype=odt)[
                arr.offset : arr.offset + len(arr) + 1
            ]
            widths = np.diff(off)
            width = int(widths[0])
            if not (widths == width).all():
                raise ValueError("BitwiseOrSketch needs uniform-width values")
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
                off[0] : off[-1]
            ]
        if width % 8:
            raise ValueError("BitwiseOrSketch needs a multiple-of-8 width")
        return data.view(np.uint64).reshape(len(arr), width // 8)

    def aggregate_block(self, block: Block):
        t = BlockAccessor.for_block(block).to_arrow()
        if t.num_rows == 0:
            return None
        arr = t[self._col].combine_chunks()
        return np.bitwise_or.reduce(self._matrix(arr), axis=0).tobytes()

    def combine(self, current, new):
        if current is None:
            return new
        if new is None:
            return current
        a = np.frombuffer(current, dtype=np.uint64)
        b = np.frombuffer(new, dtype=np.uint64)
        return np.bitwise_or(a, b).tobytes()

    def finalize(self, accumulator):
        return accumulator
