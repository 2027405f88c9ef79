"""Request / sequence state and sampling parameters.

Priority semantics mirror the reference queue scheduler
(urgent > high > medium > low, FIFO within a class —
reference: benchmark-vllm/queue_manager.py:579-580), applied here at token
granularity instead of deployment granularity.
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional, Sequence

PRIORITY_ORDER = {"urgent": 0, "high": 1, "medium": 2, "low": 3}

_req_counter = itertools.count()


@dataclass
class SamplingParams:
    max_tokens: int = 16
    temperature: float = 1.0
    top_k: int = 0          # 0 = disabled
    top_p: float = 1.0
    min_p: float = 0.0
    seed: Optional[int] = None
    stop_token_ids: Sequence[int] = ()
    stop: Sequence[str] = ()
    ignore_eos: bool = False
    logprobs: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    n: int = 1
    echo: bool = False

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0


class RequestStatus(Enum):
    WAITING = "waiting"
    RUNNING = "running"
    PREEMPTED = "preempted"
    FINISHED_STOPPED = "stop"        # hit stop token / string
    FINISHED_LENGTH = "length"       # hit max_tokens / max_model_len
    FINISHED_ABORTED = "abort"

    @property
    def finished(self) -> bool:
        return self in (RequestStatus.FINISHED_STOPPED,
                        RequestStatus.FINISHED_LENGTH,
                        RequestStatus.FINISHED_ABORTED)

    @property
    def finish_reason(self) -> Optional[str]:
        return self.value if self.finished else None


@dataclass
class Request:
    prompt_token_ids: List[int]
    sampling: SamplingParams
    request_id: str = ""
    priority: str = "medium"
    arrival_time: float = field(default_factory=time.monotonic)

    status: RequestStatus = RequestStatus.WAITING
    output_token_ids: List[int] = field(default_factory=list)
    # per generated token: {"logprob": float, "top": [(token_id, lp), ...]}
    logprob_data: List[dict] = field(default_factory=list)
    # paged-KV bookkeeping
    block_ids: List[int] = field(default_factory=list)
    num_computed_tokens: int = 0  # prompt tokens whose KV is materialized
    # metrics
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None
    # decode slot while running (index into the static decode batch)
    slot: Optional[int] = None
    # block-table entries changed in place (sliding-window recycling
    # nulls head pages without changing len(block_ids)); the engine must
    # re-upload this row even though the length is unchanged
    bt_dirty: bool = False
    # sliding-window recycling cursor: block_ids[:num_recycled_blocks] are
    # already nulled, so each decode schedule scans from here, not 0
    num_recycled_blocks: int = 0
    # prefill programs that admitted a LATER same-class request while
    # this one waited (shortest-first packing); at
    # cfg.prefill_aging_limit the scheduler reverts to strict FIFO for
    # this request so long prompts cannot starve
    prefill_overtaken: int = 0
    # adaptive speculation state: acceptance-rate EMA (1.0 = optimistic
    # start) and a token-denominated cooldown after the EMA falls below
    # cfg.spec_min_accept (the row re-probes when it reaches 0)
    spec_accept_ema: float = 1.0
    spec_cooldown: int = 0
    # the USER's prompt length: preemption-with-recompute folds generated
    # tokens into prompt_token_ids (scheduler._preempt), so max_tokens
    # accounting and the user-visible output must slice against this,
    # not len(prompt_token_ids)
    orig_prompt_len: int = 0

    def __post_init__(self):
        if not self.request_id:
            self.request_id = f"req-{next(_req_counter)}"
        if not self.orig_prompt_len:
            self.orig_prompt_len = len(self.prompt_token_ids)

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.num_prompt_tokens + len(self.output_token_ids)

    @property
    def all_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def num_generated(self) -> int:
        """Tokens generated for the USER (survives preemption folding)."""
        return self.num_tokens - self.orig_prompt_len

    @property
    def generated_token_ids(self) -> List[int]:
        return self.all_token_ids[self.orig_prompt_len:]

    @property
    def prefill_done(self) -> bool:
        return self.num_computed_tokens >= self.num_prompt_tokens

    def sort_key(self):
        return (PRIORITY_ORDER.get(self.priority, 2), self.arrival_time)
