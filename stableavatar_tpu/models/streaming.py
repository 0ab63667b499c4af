"""Host-streamed ("sequential offload") DiT forward — run models bigger
than HBM on one chip.

TPU-native analog of the reference's `sequential_cpu_offload` mode
(`inference.py:513-524`, diffusers `enable_sequential_cpu_offload`), which
exists to run the 14B model on a device that cannot hold its weights: the
14B DiT is ~28 GB bf16 / ~19.7 GB int8-stored — over a 16 GB v5e's HBM
(`scripts/probe_14b_singlechip.py`).

Design (not a port — the reference moves whole `nn.Module`s device<->host
via forward hooks; we exploit the scan-stacked block structure instead):

- every NON-block parameter (patch embed, time/text/img embeddings, vocal
  projector, head) stays resident in HBM — for 14B that is well under 1 GB;
- the 40 transformer blocks live in HOST RAM as per-layer numpy pytrees;
- the forward runs prologue (one jit) -> a Python loop over layers where
  layer k+1's weights are `jax.device_put` (an async H2D DMA) BEFORE layer
  k's compute is dispatched -> head (one jit).  JAX's async dispatch means
  the transfer of layer k+1 overlaps layer k's compute; HBM holds at most
  TWO blocks (~1.8 GB bf16 at 14B) plus activations;
- the per-layer block program is jitted ONCE and reused for every layer
  (identical shapes), exactly like the in-memory `lax.scan` body.

Numerics: the prologue/block/head functions are the *same functions* the
in-memory `dit_forward` uses (`models/dit.py:dit_prologue/apply_block/
_apply_head`), so the streamed forward equals the in-memory forward
(asserted in tests/test_streaming.py).

Steady-state cost model: compute per block (14B @ 21.5k tokens, CFG 3) is
~1 s on a v5e; streaming 0.91 GB/block over a real host's PCIe (>20 GB/s)
is ~45 ms — fully hidden behind compute.  Over the tunneled dev transport
the same copy is minutes (the measured probe is expected to be SLOW here;
the design targets real hosts).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stableavatar_tpu.config import DiTConfig
from stableavatar_tpu.models.dit import (
    _apply_head,
    apply_block,
    dit_prologue,
)


def split_streaming_params(params):
    """(resident_params, host_blocks): blocks -> per-layer host numpy trees.

    Accepts either device or host (numpy) param trees; the stacked block
    leaves are sliced per layer and materialized on host.  Checkpoint-loaded
    numpy trees are sliced zero-copy (numpy views)."""
    resident = {k: v for k, v in params.items() if k != "blocks"}
    stacked = params["blocks"]
    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    host_stacked = jax.tree.map(np.asarray, stacked)
    host_blocks = [
        jax.tree.map(lambda x: x[i], host_stacked) for i in range(n_layers)
    ]
    return resident, host_blocks


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "video_sample_n_frames", "vocal_cfg_tile",
        "is_clip_level_modeling", "rope_split", "honor_vocal_k_lens",
    ),
)
def _prologue_jit(
    resident, cfg, x, t, text_embeds, clip_fea, y, vocal_embeddings,
    video_sample_n_frames, vocal_cfg_tile, is_clip_level_modeling,
    rope_split, honor_vocal_k_lens,
):
    outs = dit_prologue(
        resident, cfg, x, t, text_embeds, clip_fea, y, vocal_embeddings,
        video_sample_n_frames=video_sample_n_frames,
        vocal_cfg_tile=vocal_cfg_tile,
        is_clip_level_modeling=is_clip_level_modeling,
        rope_split=rope_split, honor_vocal_k_lens=honor_vocal_k_lens,
    )
    # drop grid / latents_num_frames (python ints — jit would promote them
    # to device arrays; StreamedDiT recomputes them from static shapes)
    return outs[:-2]


@partial(
    jax.jit,
    static_argnames=("cfg", "latents_num_frames", "attn_quant", "attn_impl"),
    donate_argnums=(1,),
)
def _block_jit(
    bp, tokens, e0, context_text, context_img, vocal_context, vocal_k_lens,
    freqs, rope_packed, cfg, latents_num_frames, attn_quant, attn_impl,
):
    return apply_block(
        bp, tokens, e0, context_text, context_img, vocal_context,
        vocal_k_lens, freqs, cfg, latents_num_frames,
        rope_packed=rope_packed, attn_quant=attn_quant, attn_impl=attn_impl,
        # streamed forward = inference only; same auto rule as dit_forward
        fuse_cross=attn_quant != "none",
    )


@partial(jax.jit, static_argnames=("cfg", "grid"))
def _head_jit(resident, cfg, tokens, e, grid):
    return _apply_head(resident, cfg, tokens, e, grid)


class StreamedDiT:
    """Callable DiT forward with host-resident blocks (module docstring).

    `params` may be raw or `prepare_fast_params`-prepared (the int8 W8A8
    storage then also HALVES the per-layer H2D traffic)."""

    def __init__(
        self,
        params,
        cfg: DiTConfig,
        *,
        rope_split: bool = False,
        attn_quant: str = "none",
        attn_impl: str = "ulysses",
        honor_vocal_k_lens: bool = True,
        device: Optional[Any] = None,
    ):
        self.cfg = cfg
        self.rope_split = rope_split
        self.attn_quant = attn_quant
        self.attn_impl = attn_impl
        self.honor_vocal_k_lens = honor_vocal_k_lens
        self.device = device if device is not None else jax.local_devices()[0]
        resident, host_blocks = split_streaming_params(params)
        # resident params go to the device once
        self.resident = jax.device_put(resident, self.device)
        self.host_blocks = host_blocks

    @classmethod
    def from_parts(
        cls,
        resident,
        host_blocks,
        cfg: DiTConfig,
        *,
        rope_split: bool = False,
        attn_quant: str = "none",
        attn_impl: str = "ulysses",
        honor_vocal_k_lens: bool = True,
        device: Optional[Any] = None,
    ) -> "StreamedDiT":
        """Assemble from an already-split (resident, host_blocks) pair —
        for loaders that never materialize the full tree on device (14B
        checkpoints) and for probes that cycle a few distinct host blocks."""
        self = cls.__new__(cls)
        self.cfg = cfg
        self.rope_split = rope_split
        self.attn_quant = attn_quant
        self.attn_impl = attn_impl
        self.honor_vocal_k_lens = honor_vocal_k_lens
        self.device = device if device is not None else jax.local_devices()[0]
        self.resident = jax.device_put(resident, self.device)
        self.host_blocks = host_blocks
        return self

    @property
    def num_layers(self) -> int:
        return len(self.host_blocks)

    def _put(self, i: int):
        """Async H2D of layer i's weights (returns immediately; the DMA
        proceeds while previously-dispatched compute runs)."""
        return jax.device_put(self.host_blocks[i], self.device)

    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        text_embeds: jnp.ndarray,
        clip_fea: jnp.ndarray,
        y: jnp.ndarray,
        vocal_embeddings: jnp.ndarray,
        video_sample_n_frames: int = 81,
        vocal_cfg_tile: bool = False,
        is_clip_level_modeling: bool = False,
        return_residual: bool = False,
    ):
        """Same contract as `dit_forward` (minus remat/freqs overrides)."""
        (tokens, e, e0, ctx_t, ctx_i, vocal_ctx, vocal_k_lens, freqs,
         rope_packed) = _prologue_jit(
            self.resident, self.cfg, x, t, text_embeds, clip_fea, y,
            vocal_embeddings, video_sample_n_frames, vocal_cfg_tile,
            is_clip_level_modeling, self.rope_split, self.honor_vocal_k_lens,
        )
        _, _, f, h, w = x.shape
        pt, ph, pw = self.cfg.patch_size
        grid = (f // pt, h // ph, w // pw)
        lnf = (video_sample_n_frames - 1) // 4 + 1
        # materialize a distinct buffer: the per-layer block jit DONATES its
        # tokens argument, which would delete the original at layer 0
        tokens_in = jnp.copy(tokens) if return_residual else None

        cur = self._put(0)
        for i in range(self.num_layers):
            nxt = self._put(i + 1) if i + 1 < self.num_layers else None
            tokens = _block_jit(
                cur, tokens, e0, ctx_t, ctx_i, vocal_ctx, vocal_k_lens,
                freqs, rope_packed, self.cfg, lnf, self.attn_quant,
                self.attn_impl,
            )
            cur = nxt  # drop the reference -> layer i's HBM frees after use

        out = _head_jit(self.resident, self.cfg, tokens, e, grid)
        if return_residual:
            return out, tokens - tokens_in
        return out
