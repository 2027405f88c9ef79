"""Continuous-batching scheduler (token granularity).

This is the token-level replacement for the reference's macro-scale queue
scheduler (reference: benchmark-vllm/queue_manager.py:523-790 — priority
FIFO, one request at a time, 30 s poll). Here the same priority policy
(urgent>high>medium>low, FIFO within class) schedules *tokens* every step:

- A step is either ONE chunked-prefill (one sequence, bucketed length) or
  ONE decode batch over all running sequences. Prefill is preferred while
  decode slots are free, so the batch fills up (prefill-priority continuous
  batching).
- Block-exhaustion triggers preemption of the lowest-priority/youngest
  running request (blocks freed, request recomputed later) — the analog of
  the reference's cancel-and-cleanup path (queue_manager.py:176-367).

Shapes stay static: decode always runs the full max_num_seqs-wide batch;
prefill lengths snap to power-of-two buckets. That keeps the XLA compile
cache small and hot (the TPU analog of CUDA-graph capture the reference
toggles with --enforce-eager, vllm_templates.py:61).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .block_allocator import BlockAllocator, OutOfBlocks
from .config import EngineConfig
from .request import Request, RequestStatus


@dataclass
class PrefillPlan:
    """One prefill PROGRAM: a batch of prompt chunks, one row per request,
    all padded to the same `bucket` length. Batching prompts into one
    program amortizes the per-program weight read and dispatch — 64
    concurrent arrivals used to serialize 64 single-row programs, the
    direct cause of the 11.4 s TTFT p50 measured in round 2.
    """
    requests: List[Request]
    starts: List[int]    # first prompt position of each chunk
    lengths: List[int]   # real tokens in each chunk
    bucket: int          # shared padded length

    # single-request accessors (row 0) for callers written against the
    # round-1 one-chunk-per-step plan shape
    @property
    def request(self) -> Request:
        return self.requests[0]

    @property
    def start(self) -> int:
        return self.starts[0]

    @property
    def length(self) -> int:
        return self.lengths[0]


@dataclass
class DecodePlan:
    requests: List[Request]  # all running seqs (slot already assigned)


@dataclass
class SchedulerOutput:
    prefill: Optional[PrefillPlan] = None
    decode: Optional[DecodePlan] = None
    preempted: List[Request] = field(default_factory=list)

    @property
    def is_idle(self) -> bool:
        return self.prefill is None and self.decode is None


class Scheduler:
    def __init__(self, cfg: EngineConfig, allocator: BlockAllocator,
                 sliding_window: Optional[int] = None):
        self.cfg = cfg
        self.allocator = allocator
        self.sliding_window = sliding_window
        self.waiting: List[Request] = []
        self.running: List[Request] = []
        self._free_slots = list(range(cfg.max_num_seqs - 1, -1, -1))
        self._consec_prefills = 0
        # waiting-side evictions (_reclaim_waiting victims): they are not
        # preemptions of RUNNING work, but they do lose partial-prefill
        # blocks and recompute — invisible in round 4's metrics, which
        # undercounted exactly the storm scenario the deadlock fix
        # addresses. Monotonic; the engine surfaces it in stats().
        self.num_waiting_evictions = 0

    # ---- queue management -------------------------------------------------

    def add(self, req: Request) -> None:
        if req.num_prompt_tokens >= self.cfg.max_model_len:
            raise ValueError(
                f"prompt length {req.num_prompt_tokens} >= max_model_len "
                f"{self.cfg.max_model_len}")
        req.status = RequestStatus.WAITING
        self.waiting.append(req)
        self.waiting.sort(key=Request.sort_key)

    def abort(self, request_id: str) -> bool:
        for q in (self.waiting, self.running):
            for r in q:
                if r.request_id == request_id:
                    self._finish(r, RequestStatus.FINISHED_ABORTED)
                    q.remove(r)
                    return True
        return False

    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_running(self) -> int:
        return len(self.running)

    # ---- per-step planning ------------------------------------------------

    def schedule(self) -> SchedulerOutput:
        out = SchedulerOutput()

        # 1. try to admit/advance a prefill while decode slots are free —
        # but never more than max_consecutive_prefills in a row while
        # sequences are decoding (mixed batching: a long prompt's chunks
        # must not stall every running decode)
        limit = self.cfg.max_consecutive_prefills
        prefill_ok = not (self.running and limit
                          and self._consec_prefills >= limit)
        if (prefill_ok and self.waiting
                and len(self.running) < self.cfg.max_num_seqs):
            plan = self._plan_prefill_batch(out)
            if plan is not None:
                out.prefill = plan
                self._consec_prefills += 1
                return out

        # 2. otherwise decode the running batch
        if self.running:
            self._ensure_decode_blocks(out)
            if self.running:
                out.decode = DecodePlan(requests=list(self.running))
                self._consec_prefills = 0
        return out

    def _bucket_for(self, n: int) -> int:
        for b in self.cfg.prefill_buckets:
            if n <= b:
                return b
        return self.cfg.prefill_buckets[-1]

    def _try_prefix_cache(self, req: Request) -> None:
        """Claim the longest cached prompt prefix (full blocks only,
        leaving at least one token to prefill so logits exist)."""
        if (req.num_computed_tokens or req.block_ids
                or not self.cfg.enable_prefix_caching
                or not hasattr(self.allocator, "prefix_match")):
            return
        bs = self.cfg.block_size
        usable = (req.num_prompt_tokens - 1) // bs * bs
        if usable <= 0:
            return
        matched = self.allocator.prefix_match(req.prompt_token_ids[:usable])
        if matched:
            req.block_ids = list(matched)
            req.num_computed_tokens = len(matched) * bs

    def _maybe_cache_prefix(self, req: Request) -> None:
        """On finish, register the sequence's full-block KV for reuse."""
        if (not self.cfg.enable_prefix_caching or not req.block_ids
                or not hasattr(self.allocator, "prefix_insert")):
            return
        bs = self.cfg.block_size
        # the final sampled token's KV was never computed
        cached_valid = req.num_tokens - 1
        nb_full = min(cached_valid // bs, len(req.block_ids))
        if 0 in req.block_ids[:nb_full]:
            return  # head pages recycled (sliding window): KV is gone
        if nb_full > 0:
            self.allocator.prefix_insert(req.all_token_ids[:nb_full * bs],
                                         req.block_ids[:nb_full])

    def _plan_prefill_batch(self, out: SchedulerOutput) -> Optional[PrefillPlan]:
        """Pack waiting prompts into ONE prefill program, SHORTEST-BUCKET
        first within the head priority class.

        Budget rules:
        - sum of real chunk lengths <= max_num_batched_tokens (the per-STEP
          prefill token budget, vLLM --max-num-batched-tokens semantics);
        - at most max_prefill_seqs rows (pow2-padded: each distinct row
          count is a compiled program variant);
        - every row needs a decode slot available for when its prompt
          completes;
        - preemption (block reclaim) is attempted only for the FIRST row —
          growing the batch never evicts running work;
        - all rows in one program share ONE length bucket: every row pads
          to it (one compiled variant per (rows, bucket) pair), so packing
          a 1024-token prompt with seven 32-token prompts would cost
          8x1024 padded rows — like-sized prompts batch together instead.

        Bucket choice (round 5): the smallest chunk bucket among the HEAD
        priority class's candidates — round 4 always took the head
        request's bucket and stopped at the first mismatch, so one 4k
        prompt at the queue head blocked every short prompt behind it for
        its entire chunked prefill (the mixed bench's 8.1 s TTFT p99 was
        pure queueing). Admission never crosses priority classes out of
        order; within the class a request overtaken
        cfg.prefill_aging_limit times forces strict FIFO (its bucket),
        bounding any request's extra wait to aging_limit prefill programs.
        """
        budget = self.cfg.max_num_batched_tokens
        free_slots = len(self._free_slots)
        max_rows = min(self.cfg.max_prefill_seqs, free_slots)
        if max_rows <= 0 or not self.waiting:
            return None
        # candidate chunk metadata in priority-FIFO order (bounded scan:
        # prefix-cache claims and bucket math per candidate)
        cands = []
        for req in list(self.waiting)[:max(4 * max_rows, 8)]:
            self._try_prefix_cache(req)
            start = req.num_computed_tokens
            length = min(req.num_prompt_tokens - start, budget)
            cands.append((req, start, length, self._bucket_for(length)))
        head = cands[0][0]
        head_cls = head.sort_key()[0]
        aging = self.cfg.prefill_aging_limit
        if aging and head.prefill_overtaken < aging:
            target = min(b for r, _, _, b in cands
                         if r.sort_key()[0] == head_cls)
        else:
            target = cands[0][3]

        sel: List[Request] = []
        starts: List[int] = []
        lengths: List[int] = []
        for req, start, length, bucket in cands:
            if len(sel) >= max_rows or budget <= 0:
                break
            length = min(length, budget)
            if self._bucket_for(length) != target or bucket != target:
                # reordering is confined to the head priority class: a
                # lower class never skips within itself (its own FIFO is
                # preserved — stop), it only fills leftover rows behind
                # an unbroken matching run
                if req.sort_key()[0] != head_cls:
                    break
                continue  # overtaken (aging accounted below)
            # blocks to hold start+length tokens (+1 lookahead for the
            # first decode token so prefill-complete can sample at once)
            end = start + length
            need_tokens = end + (1 if end == req.num_prompt_tokens else 0)
            need_blocks = (-(-need_tokens // self.cfg.block_size)
                           - len(req.block_ids))
            if need_blocks > 0:
                if need_blocks > self.allocator.num_free:
                    ok = (not sel
                          and (self._reclaim(need_blocks,
                                             victim_exempt=req, out=out)
                               or self._reclaim_waiting(need_blocks, req)))
                    if not ok:
                        if sel:
                            break
                        return None
                req.block_ids.extend(self.allocator.allocate(need_blocks))
            sel.append(req)
            starts.append(start)
            lengths.append(length)
            budget -= length
        if not sel:
            return None
        # aging: every candidate ordered before the last admitted row that
        # was NOT admitted lost a turn to a later request
        admitted = {id(r) for r in sel}
        last_idx = max(i for i, c in enumerate(cands)
                       if id(c[0]) in admitted)
        for req, _, _, _ in cands[:last_idx]:
            if id(req) not in admitted:
                req.prefill_overtaken += 1
        bucket = self._bucket_for(max(lengths))
        assert bucket == target
        return PrefillPlan(requests=sel, starts=starts, lengths=lengths,
                           bucket=bucket)

    def _recycle_window_blocks(self, req: Request) -> None:
        """Sliding-window models: free whole pages that have fallen out of
        the attention window (the decode kernel clamps its page loop to
        first = (kv_len - window + 1) // block_size, so pages below that
        index are never read again — the window only moves forward). The
        freed page's block-table entry becomes the null block (0); list
        positions are preserved so later pages keep their indices.

        vLLM handles this with a rolling buffer; with paged KV the natural
        TPU analog is head-page recycling into the shared pool."""
        w = self.sliding_window
        if w is None:
            return
        bs = self.cfg.block_size
        cached = req.num_tokens - 1  # tokens whose KV is materialized
        first = max(0, cached - w + 1) // bs
        freed = []
        for i in range(req.num_recycled_blocks,
                       min(first, len(req.block_ids))):
            b = req.block_ids[i]
            if b != 0:
                freed.append(b)
                req.block_ids[i] = 0
        req.num_recycled_blocks = max(req.num_recycled_blocks,
                                      min(first, len(req.block_ids)))
        if freed:
            self.allocator.free(freed)
            req.bt_dirty = True

    def _ensure_decode_blocks(self, out: SchedulerOutput) -> None:
        """Every running seq needs capacity for the next multi-step chunk."""
        lookahead = max(self.cfg.decode_steps_per_call,
                        self.cfg.num_speculative_tokens + 1)
        for req in list(self.running):
            self._recycle_window_blocks(req)
            need_tokens = min(req.num_tokens + lookahead,
                              self.cfg.max_model_len)
            need_blocks = (-(-need_tokens // self.cfg.block_size)
                           - len(req.block_ids))
            if need_blocks <= 0:
                continue
            # waiting-side eviction first: waiters' partial-prefill blocks
            # merely re-prefill, while preempting a RUNNING request loses
            # its whole computed KV — strictly cheaper when either would
            # satisfy the shortage. (_plan_prefill_batch keeps the
            # opposite order: the requester there is itself a waiter.)
            if not (self._reclaim_waiting(need_blocks, req)
                    or self._reclaim(need_blocks, victim_exempt=req, out=out)):
                # could not free enough even with preemption: preempt req itself
                self._preempt(req, out)
                continue
            req.block_ids.extend(self.allocator.allocate(need_blocks))

    def _reclaim(self, need_blocks: int, victim_exempt: Request,
                 out: SchedulerOutput) -> bool:
        """Preempt running requests (lowest priority, youngest first) until
        `need_blocks` are free."""
        while self.allocator.num_free < need_blocks:
            victims = [r for r in self.running if r is not victim_exempt]
            if not victims:
                return False
            victims.sort(key=Request.sort_key)
            self._preempt(victims[-1], out)
        return True

    def _reclaim_waiting(self, need_blocks: int,
                         exempt: Request) -> bool:
        """Free partial-prefill blocks held by OTHER waiting requests.

        Deadlock breaker (found round 4): under a preemption storm every
        request can end up back in `waiting` holding a few blocks of
        partial prefill state, each needing more than the residual free
        pool — hold-and-wait with no running victims for _reclaim, so
        the engine idled forever with work queued. The highest-priority
        waiting request must always be able to progress: evict other
        waiters' held blocks (lowest priority, youngest first — they
        merely re-prefill) until it fits."""
        victims = [r for r in self.waiting
                   if r is not exempt and r.block_ids]
        victims.sort(key=Request.sort_key)
        while self.allocator.num_free < need_blocks and victims:
            v = victims.pop()
            self.allocator.free([b for b in v.block_ids if b != 0])
            v.block_ids = []
            v.num_computed_tokens = 0
            v.num_recycled_blocks = 0
            self.num_waiting_evictions += 1
        return self.allocator.num_free >= need_blocks

    def _preempt(self, req: Request, out: SchedulerOutput) -> None:
        self.allocator.free([b for b in req.block_ids if b != 0])
        req.block_ids = []
        req.bt_dirty = False  # no live block table to be dirty about
        req.num_recycled_blocks = 0
        # recompute-from-scratch restart: generated tokens are folded into
        # the prompt so decode resumes where it left off
        req.prompt_token_ids = req.all_token_ids
        req.output_token_ids = []
        req.num_computed_tokens = 0
        if req.slot is not None:
            self._free_slots.append(req.slot)
            req.slot = None
        if req in self.running:
            self.running.remove(req)
        req.status = RequestStatus.PREEMPTED
        self.waiting.append(req)
        self.waiting.sort(key=Request.sort_key)
        out.preempted.append(req)

    # ---- state transitions driven by the engine ---------------------------

    def on_prefill_progress(self, req: Request, length: int) -> None:
        req.num_computed_tokens += length
        if req.prefill_done:
            self.waiting.remove(req)
            req.status = RequestStatus.RUNNING
            req.slot = self._free_slots.pop()
            self.running.append(req)

    def finish(self, req: Request, status: RequestStatus) -> None:
        self._finish(req, status)
        if req in self.running:
            self.running.remove(req)
        if req in self.waiting:
            self.waiting.remove(req)

    def _finish(self, req: Request, status: RequestStatus) -> None:
        import time as _t
        req.status = status
        req.finish_time = _t.monotonic()
        if req.block_ids:
            if status != RequestStatus.FINISHED_ABORTED:
                self._maybe_cache_prefix(req)
            self.allocator.free([b for b in req.block_ids if b != 0])
            req.block_ids = []
        if req.slot is not None:
            self._free_slots.append(req.slot)
            req.slot = None
