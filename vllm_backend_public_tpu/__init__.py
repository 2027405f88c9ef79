"""TPU-native LLM serving framework.

A from-scratch JAX/XLA/Pallas inference engine plus benchmark control plane,
with the capabilities of ThakiCloud/vllm-backend-public (see /root/repo/SURVEY.md).

The engine half replaces the vLLM server the reference deploys
(reference: benchmark-vllm/vllm_templates.py:50-87 builds the vLLM CLI);
the services half reimplements the six FastAPI microservices idiomatically,
retargeted from GPU/K8s pods to TPU-slice deployments.
"""

__version__ = "0.1.0"
