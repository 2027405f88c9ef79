"""Engine step outputs."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class RequestOutput:
    request_id: str
    new_token_ids: List[int] = field(default_factory=list)
    output_token_ids: List[int] = field(default_factory=list)
    finished: bool = False
    finish_reason: Optional[str] = None
    num_prompt_tokens: int = 0
    # logprob entries for new_token_ids (when requested):
    # {"logprob": float, "top": [(token_id, logprob), ...]}
    logprobs: Optional[List[dict]] = None
    # wall-clock metrics (monotonic seconds)
    ttft: Optional[float] = None
    latency: Optional[float] = None
