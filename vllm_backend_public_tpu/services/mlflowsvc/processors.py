"""Model-release YAML processors — the engine-pluggability seam.

Strategy pattern mirroring the reference (reference:
benchmark-mlflow/processors/base_processor.py:53-65 stamps the global
section; vllm_processor.py:11-46 and tensorrt_llm_processor.py:11-45 set
engine-specific fields). The TPU engine registers here as a third
processor type — exactly the seam the reference designed for new engines.
"""

from __future__ import annotations

import time
from typing import Dict


class BaseYAMLProcessor:
    engine = "base"

    def process(self, template: dict, event: dict) -> dict:
        doc = dict(template)
        glob = dict(doc.get("global") or {})
        glob.update({
            "experimentId": event.get("experiment_id", ""),
            "runid": event.get("run_id", ""),
            "modelid": event["model_id"],
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "modelName": event["model_name"],
            "modelVersion": event.get("version", ""),
        })
        doc["global"] = glob
        return self.engine_fields(doc, event)

    def engine_fields(self, doc: dict, event: dict) -> dict:
        return doc

    @staticmethod
    def _safe(name: str) -> str:
        return name.lower().replace("/", "-").replace("_", "-")


class VLLMProcessor(BaseYAMLProcessor):
    engine = "vllm"

    def engine_fields(self, doc: dict, event: dict) -> dict:
        name = self._safe(event["model_name"])
        vllm = doc.setdefault("vllm", {}).setdefault("vllm", {})
        vllm["model"] = f"/data/local_models/{event['model_name']}"
        doc["vllm"]["fullnameOverride"] = f"vllm-{name}"
        doc["vllm"].setdefault("serviceAccount", {})["name"] = f"sa-{name}"
        return doc


class TensorRTLLMProcessor(BaseYAMLProcessor):
    engine = "tensorrt-llm"

    def engine_fields(self, doc: dict, event: dict) -> dict:
        name = self._safe(event["model_name"])
        trt = doc.setdefault("tensorrt-llm", {})
        trt.setdefault("model", {})["path"] = \
            f"/data/local_models/{event['model_name']}"
        trt["fullnameOverride"] = f"trt-{name}"
        return doc


class TPUEngineProcessor(BaseYAMLProcessor):
    """The new engine type: renders an EngineDeployment for the TPU-native
    engine this repo implements."""

    engine = "tpu"

    def engine_fields(self, doc: dict, event: dict) -> dict:
        name = self._safe(event["model_name"])
        eng = doc.setdefault("engine", {})
        eng.update({
            "kind": "EngineDeployment",
            "name": f"tpu-{name}",
            "model": f"/data/local_models/{event['model_name']}",
            "served_model_name": event["model_name"],
        })
        eng.setdefault("dtype", "bfloat16")
        eng.setdefault("tensor_parallel_size", 1)
        return doc


PROCESSORS: Dict[str, BaseYAMLProcessor] = {
    p.engine: p() for p in (VLLMProcessor, TensorRTLLMProcessor,
                            TPUEngineProcessor)
}


def get_processor(engine: str) -> BaseYAMLProcessor:
    if engine not in PROCESSORS:
        raise ValueError(f"unknown engine type {engine}; "
                         f"known: {sorted(PROCESSORS)}")
    return PROCESSORS[engine]
