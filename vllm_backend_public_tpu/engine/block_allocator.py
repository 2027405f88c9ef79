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


class NativeBlockAllocator:
    """C++ allocator + radix prefix cache (native/allocator.cc, ctypes).

    Same interface as BlockAllocator plus prefix-cache operations. Raises
    ImportError at construction if the native library can't be built."""

    def __init__(self, num_blocks: int, block_size: int = 16):
        import ctypes

        from ..utils.native import build_and_load

        lib = build_and_load("vbpt_alloc", ["allocator.cc"])
        if lib is None:
            raise ImportError("native allocator unavailable (no g++?)")
        self._lib = lib
        lib.vbpt_alloc_create.restype = ctypes.c_void_p
        lib.vbpt_alloc_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.vbpt_alloc_destroy.argtypes = [ctypes.c_void_p]
        lib.vbpt_alloc_num_free.argtypes = [ctypes.c_void_p]
        lib.vbpt_alloc_num_free.restype = ctypes.c_int32
        lib.vbpt_alloc_allocate.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.vbpt_alloc_allocate.restype = ctypes.c_int32
        lib.vbpt_alloc_free.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.vbpt_alloc_free.restype = ctypes.c_int32
        lib.vbpt_alloc_fork.argtypes = lib.vbpt_alloc_free.argtypes
        lib.vbpt_alloc_fork.restype = ctypes.c_int32
        lib.vbpt_alloc_ref_count.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.vbpt_alloc_ref_count.restype = ctypes.c_int32
        lib.vbpt_prefix_insert.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.vbpt_prefix_insert.restype = ctypes.c_int32
        lib.vbpt_prefix_match.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.vbpt_prefix_match.restype = ctypes.c_int32
        lib.vbpt_alloc_stats.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int64)]

        self._ctypes = ctypes
        self._h = lib.vbpt_alloc_create(num_blocks, block_size)
        if not self._h:
            raise ValueError("need at least 2 blocks (block 0 is reserved)")
        self.num_blocks = num_blocks
        self.block_size = block_size

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.vbpt_alloc_destroy(h)
            self._h = None

    @property
    def num_free(self) -> int:
        return self._lib.vbpt_alloc_num_free(self._h)

    def allocate(self, n: int) -> List[int]:
        ct = self._ctypes
        out = (ct.c_int32 * max(n, 1))()
        if self._lib.vbpt_alloc_allocate(self._h, n, out) != 0:
            raise OutOfBlocks(f"requested {n}, free {self.num_free}")
        return list(out[:n])

    def free(self, blocks: Sequence[int]) -> None:
        ct = self._ctypes
        n = len(blocks)
        arr = (ct.c_int32 * max(n, 1))(*blocks)
        if self._lib.vbpt_alloc_free(self._h, arr, n) != 0:
            raise ValueError(f"bad free of {list(blocks)}")

    def fork(self, blocks: Sequence[int]) -> None:
        ct = self._ctypes
        n = len(blocks)
        arr = (ct.c_int32 * max(n, 1))(*blocks)
        if self._lib.vbpt_alloc_fork(self._h, arr, n) != 0:
            raise ValueError(f"bad fork of {list(blocks)}")

    def ref_count(self, block: int) -> int:
        return self._lib.vbpt_alloc_ref_count(self._h, block)

    # ---- prefix cache ---------------------------------------------------

    def prefix_insert(self, tokens: Sequence[int],
                      blocks: Sequence[int]) -> None:
        """Register full-block prefix KV (len(tokens) must be
        len(blocks)*block_size)."""
        ct = self._ctypes
        nb = len(blocks)
        if len(tokens) < nb * self.block_size:
            raise ValueError("tokens shorter than blocks*block_size")
        t = (ct.c_int32 * (nb * self.block_size))(
            *tokens[:nb * self.block_size])
        b = (ct.c_int32 * max(nb, 1))(*blocks)
        self._lib.vbpt_prefix_insert(self._h, t, b, nb)

    def prefix_match(self, tokens: Sequence[int]) -> List[int]:
        """Longest cached prefix; returned blocks carry a new reference."""
        ct = self._ctypes
        n = len(tokens)
        max_out = n // self.block_size
        if max_out == 0:
            return []
        t = (ct.c_int32 * n)(*tokens)
        out = (ct.c_int32 * max_out)()
        m = self._lib.vbpt_prefix_match(self._h, t, n, out, max_out)
        return list(out[:m])

    def stats(self) -> dict:
        ct = self._ctypes
        buf = (ct.c_int64 * 4)()
        self._lib.vbpt_alloc_stats(self._h, buf)
        return {"prefix_queries": buf[0], "prefix_hits": buf[1],
                "evictions": buf[2], "cached_blocks": buf[3]}


def make_allocator(num_blocks: int, block_size: int = 16,
                   prefer_native: bool = True):
    if prefer_native:
        try:
            return NativeBlockAllocator(num_blocks, block_size)
        except ImportError:
            pass
    return BlockAllocator(num_blocks)
