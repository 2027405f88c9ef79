"""KV block allocator: ref-counted page pool with prefix-cache hooks.

TPU-native analog of vLLM's C++/Python block manager (reference exposes it
only as the `--block-size` flag: benchmark-vllm/vllm_templates.py:54). The
pure-Python implementation is authoritative; `native/` provides a C++
drop-in (ctypes) for large pools.

Block 0 is reserved as the null block: padded block-table entries point at
it, masked attention never reads it as valid, masked writes are dropped.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple


class OutOfBlocks(Exception):
    pass


class BlockAllocator:
    def __init__(self, num_blocks: int):
        if num_blocks < 2:
            raise ValueError("need at least 2 blocks (block 0 is reserved)")
        self.num_blocks = num_blocks
        self._free: List[int] = list(range(num_blocks - 1, 0, -1))  # pop() -> 1,2,..
        self._refcount: Dict[int, int] = {}

    @property
    def num_free(self) -> int:
        return len(self._free)

    def allocate(self, n: int) -> List[int]:
        if n > len(self._free):
            raise OutOfBlocks(f"requested {n}, free {len(self._free)}")
        blocks = [self._free.pop() for _ in range(n)]
        for b in blocks:
            self._refcount[b] = 1
        return blocks

    def fork(self, blocks: Sequence[int]) -> None:
        """Share blocks with another sequence (copy-on-write prefix reuse)."""
        for b in blocks:
            self._refcount[b] += 1

    def free(self, blocks: Sequence[int]) -> None:
        for b in blocks:
            rc = self._refcount.get(b)
            if rc is None:
                raise ValueError(f"double free of block {b}")
            if rc == 1:
                del self._refcount[b]
                self._free.append(b)
            else:
                self._refcount[b] = rc - 1

    def ref_count(self, block: int) -> int:
        return self._refcount.get(block, 0)
