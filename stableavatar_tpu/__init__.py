"""StableAvatar-TPU: a TPU-native (JAX/XLA/Pallas/pjit) audio-driven talking-avatar
video generation framework.

Re-implements the full capability surface of the reference StableAvatar
(Wan2.1-DiT based audio-driven avatar generator) with a TPU-first design:

- pure-functional models (pytree params + jitted apply functions)
- bf16 MXU-friendly compute with fp32 norm/softmax internals
- GSPMD parallelism over a ('dp', 'fsdp', 'sp') device mesh replacing
  DDP/DeepSpeed-ZeRO/FSDP/xfuser-Ulysses/ring of the reference
- Pallas flash-attention kernels for the DiT hot path
- a sliding-window infinite-length pipeline with constant per-window HBM
"""

__version__ = "0.1.0"

from stableavatar_tpu.config import (  # noqa: F401
    DiTConfig,
    VAEConfig,
    T5Config,
    CLIPConfig,
    Wav2Vec2Config,
    WAN_1_3B,
    WAN_14B,
)
