"""hydrainfer_tpu — a TPU-native multimodal LLM serving engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HydraInfer
(arXiv:2505.12658): EPD-disaggregated scheduling of Encode (vision), Prefill
and Decode stages over chip groups of a TPU pod slice, with a paged KV /
image-feature cache in HBM and block migration between stages over ICI.

Architecture stance (vs. the CUDA/torch reference at /root/reference):
  - functional core / actor shell: models are pure JAX functions over pytrees,
    caches are donated jnp arrays threaded through jitted step functions;
  - static shapes: ragged batches are bucketed+padded so every hot path hits
    the jit cache (this replaces the reference's CUDA-graph runner);
  - Pallas kernels with jnp reference twins selected by a handler chain
    (the jnp twin doubles as the CPU/interpret-mode test oracle);
  - single-controller: one process owns every chip; "nodes" are asyncio
    actors bound to device subsets, migration is device-to-device transfer.
"""

__version__ = "0.1.0"
