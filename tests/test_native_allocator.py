"""C++ allocator vs Python allocator equivalence + prefix-cache behavior."""

import numpy as np
import pytest

from vllm_backend_public_tpu.engine.block_allocator import (
    BlockAllocator, NativeBlockAllocator, OutOfBlocks)


@pytest.fixture(scope="module")
def native():
    try:
        return NativeBlockAllocator(64, block_size=4)
    except ImportError:
        pytest.skip("no C++ toolchain")


def test_native_builds(native):
    assert native.num_free == 63


def test_randomized_equivalence():
    """Python and C++ allocators agree on num_free through random op
    sequences (ids may differ; accounting must match)."""
    try:
        nat = NativeBlockAllocator(32, block_size=4)
    except ImportError:
        pytest.skip("no C++ toolchain")
    py = BlockAllocator(32)
    rng = np.random.default_rng(0)
    held_nat, held_py = [], []
    for _ in range(300):
        op = rng.random()
        if op < 0.5:
            n = int(rng.integers(1, 5))
            if py.num_free >= n:
                held_nat.append(nat.allocate(n))
                held_py.append(py.allocate(n))
            else:
                with pytest.raises(OutOfBlocks):
                    py.allocate(n)
                with pytest.raises(OutOfBlocks):
                    nat.allocate(n)
        elif held_py:
            i = int(rng.integers(0, len(held_py)))
            nat.free(held_nat.pop(i))
            py.free(held_py.pop(i))
        assert nat.num_free == py.num_free


def test_fork_refcounting():
    try:
        nat = NativeBlockAllocator(16, block_size=4)
    except ImportError:
        pytest.skip("no C++ toolchain")
    blocks = nat.allocate(3)
    nat.fork(blocks)
    assert nat.ref_count(blocks[0]) == 2
    nat.free(blocks)
    assert nat.ref_count(blocks[0]) == 1
    assert nat.num_free == 15 - 3
    nat.free(blocks)
    assert nat.num_free == 15


def test_prefix_cache_match_and_eviction():
    try:
        nat = NativeBlockAllocator(8, block_size=4)  # 7 usable
    except ImportError:
        pytest.skip("no C++ toolchain")
    tokens = list(range(12))  # 3 full blocks
    blocks = nat.allocate(3)
    nat.prefix_insert(tokens, blocks)
    nat.free(blocks)  # cached blocks stay resident, evictable
    st = nat.stats()
    assert st["cached_blocks"] == 3

    # exact prefix reuse
    m = nat.prefix_match(tokens + [99])
    assert len(m) == 3 and m == blocks
    assert nat.ref_count(blocks[0]) == 1
    # partial prefix (2 blocks + divergent tail)
    m2 = nat.prefix_match(tokens[:8] + [55, 56, 57, 58])
    assert len(m2) == 2 and m2 == blocks[:2]
    nat.free(m)
    nat.free(m2)

    # allocation pressure evicts unreferenced cached blocks
    big = nat.allocate(7)
    assert len(big) == 7
    assert nat.stats()["evictions"] >= 1
    nat.free(big)

    # miss accounting
    nat.prefix_match([7, 7, 7, 7])
    st = nat.stats()
    assert st["prefix_queries"] >= 3


# ---------------------------------------------------------- re-adoption

def test_procman_readopt_across_instances(tmp_path):
    """A process spawned by one ProcessManager survives that manager and
    is re-adopted (watched, stoppable) by a fresh instance — the
    reference's pods-outlive-the-service pattern (vllm_manager.py:61-76)."""
    import asyncio
    import os
    import sys

    from vllm_backend_public_tpu.services.common.procman import \
        ProcessManager

    async def go():
        log_dir = str(tmp_path)
        pm1 = ProcessManager(log_dir=log_dir, total_tpu_chips=4)
        await pm1.spawn("eng-x", "engine",
                        [sys.executable, "-c", "import time; time.sleep(60)"],
                        tpu_chips=2)
        pid = pm1.get("eng-x").pid
        assert pm1.get("eng-x").status == "running"
        # manager "restarts": new instance, same state file
        pm2 = ProcessManager(log_dir=log_dir, total_tpu_chips=4)
        adopted = await pm2.readopt()
        assert adopted == ["eng-x"]
        mp = pm2.get("eng-x")
        assert mp.adopted and mp.pid == pid and mp.status == "running"
        # chip accounting carried over
        assert pm2.tpu_chips_in_use() == 2
        # stop through the adopting manager actually kills it
        assert await pm2.stop("eng-x")
        await asyncio.sleep(0.3)
        assert mp.status == "failed"  # non-child: exit code unknowable
        with __import__("contextlib").suppress(ProcessLookupError):
            os.kill(pid, 0)
            raise AssertionError("process still alive after stop")

    asyncio.new_event_loop().run_until_complete(go())


def test_procman_readopt_skips_dead_and_reused_pids(tmp_path):
    import asyncio
    import json
    import os
    import sys

    from vllm_backend_public_tpu.services.common.procman import \
        ProcessManager

    async def go():
        log_dir = str(tmp_path)
        pm1 = ProcessManager(log_dir=log_dir)
        await pm1.spawn("gone", "engine",
                        [sys.executable, "-c", "pass"])
        await asyncio.sleep(0.5)  # let it exit
        # forge a stale record pointing at a live but UNRELATED pid
        state_path = os.path.join(log_dir, "procman-state.json")
        state = [{"name": "gone", "kind": "engine",
                  "command": [sys.executable, "-c", "pass"], "pid": 99999999},
                 {"name": "stolen", "kind": "engine",
                  "command": ["definitely-not-this-binary"],
                  "pid": os.getpid()}]
        with open(state_path, "w") as f:
            json.dump(state, f)
        pm2 = ProcessManager(log_dir=log_dir)
        assert await pm2.readopt() == []

    asyncio.new_event_loop().run_until_complete(go())
