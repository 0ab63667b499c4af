from stableavatar_tpu.ops.norms import rms_norm, layer_norm  # noqa: F401
from stableavatar_tpu.ops.embeddings import sinusoidal_embedding_1d  # noqa: F401
from stableavatar_tpu.ops.rope import rope_freqs_3d, rope_apply, RopeFreqs  # noqa: F401
from stableavatar_tpu.ops.attention import attention  # noqa: F401
