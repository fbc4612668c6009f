"""Window algebra for the infinite-tensor runtime.

A ``TensorWindow(size, stride, offset)`` places window index ``idx`` over the
half-open box ``[offset + idx*stride, offset + idx*stride + size)`` per
dimension (the same window algebra the reference's external infinite-tensor
library exposes; usage at `world_pipeline.py:1146-1147, 1259-1260` and
`annotated_infinite_panorama.py:153-166`).

All coordinates are integers and may be negative (unbounded domain).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Iterator, Sequence


def _floordiv(a: int, b: int) -> int:
    return a // b  # python floordiv is floor for negatives


@dataclasses.dataclass(frozen=True)
class TensorWindow:
    size: tuple
    stride: tuple
    offset: tuple | None = None

    def __post_init__(self):
        object.__setattr__(self, "size", tuple(int(s) for s in self.size))
        object.__setattr__(self, "stride", tuple(int(s) for s in self.stride))
        off = self.offset if self.offset is not None else (0,) * len(self.size)
        object.__setattr__(self, "offset", tuple(int(o) for o in off))
        assert len(self.size) == len(self.stride) == len(self.offset)

    @property
    def ndim(self) -> int:
        return len(self.size)

    def start(self, idx: Sequence[int]) -> tuple:
        return tuple(self.offset[d] + idx[d] * self.stride[d] for d in range(self.ndim))

    def box(self, idx: Sequence[int]) -> tuple:
        """((start, stop), ...) box covered by window `idx`."""
        s = self.start(idx)
        return tuple((s[d], s[d] + self.size[d]) for d in range(self.ndim))

    def index_range(self, ranges: Sequence[tuple]) -> tuple:
        """Per-dim (lo, hi) window-index range overlapping the given boxes.

        Window i overlaps [a, b) iff offset + i*stride < b and
        offset + i*stride + size > a.
        """
        out = []
        for d, (a, b) in enumerate(ranges):
            st, sz, off = self.stride[d], self.size[d], self.offset[d]
            lo = _floordiv(a - off - sz, st) + 1
            hi = _floordiv(b - off - 1, st)  # inclusive
            out.append((lo, hi))
        return tuple(out)

    def windows_overlapping(self, ranges: Sequence[tuple]) -> Iterator[tuple]:
        """All window indices whose boxes intersect the given region."""
        ir = self.index_range(ranges)
        axes = [range(lo, hi + 1) for lo, hi in ir]
        return itertools.product(*axes)
