"""ASR fine-tuning: sharded training step.

The reference is inference-only; this is the training capability the
TPU-native framework adds on top. A step computes the causal-LM
cross-entropy of the decoder over (audio, transcript) pairs — audio
embeddings from the encoder are injected into the prompt exactly as at
inference time — and applies an optax update. The whole step is jit
compiled over a (dp, tp) mesh: batch sharded on dp, decoder weights
Megatron-sharded on tp (see parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..config import AsrConfig
from ..models.audio_encoder import AudioEncoder
from ..models.text_decoder import TextDecoder
from ..runtime.prompt import AUDIO_OFFSET

PyTree = Any


@dataclasses.dataclass
class TrainState:
    params: PyTree       # {"encoder": ..., "decoder": ...}
    opt_state: PyTree
    step: jax.Array


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def asr_loss(
    config: AsrConfig,
    encoder: AudioEncoder,
    decoder: TextDecoder,
    params: PyTree,
    batch: dict,
    remat: bool = True,
):
    """Causal-LM cross entropy over transcript tokens.

    batch:
      mel:        (B, num_mel_bins, F) log-mel, padded frames == 0
      n_frames:   (B,) int32 true frame counts
      n_audio:    (B,) int32 valid audio-token counts
      token_ids:  (B, P) int32 full sequence (prompt + transcript + pad)
      loss_mask:  (B, P) f32, 1.0 on positions whose NEXT token is a
                  transcript target
    """
    enc_p, dec_p = params["encoder"], params["decoder"]
    mel, token_ids = batch["mel"], batch["token_ids"]
    b, p = token_ids.shape

    flat, _ = jax.vmap(encoder, in_axes=(None, 0, 0))(
        enc_p, mel, batch["n_frames"]
    )  # (B, C*tpc, output_dim)

    tok_embeds = decoder.embed(dec_p, token_ids)  # (B, P, H)
    hidden_dim = tok_embeds.shape[-1]
    shifted = jnp.zeros((b, p, hidden_dim), tok_embeds.dtype)
    n_copy = min(flat.shape[1], p - AUDIO_OFFSET)
    shifted = jax.lax.dynamic_update_slice(
        shifted, flat[:, :n_copy].astype(tok_embeds.dtype), (0, AUDIO_OFFSET, 0)
    )
    pos = jnp.arange(p)
    is_audio = (pos[None, :] >= AUDIO_OFFSET) & (
        pos[None, :] < AUDIO_OFFSET + batch["n_audio"][:, None]
    )
    hidden = jnp.where(is_audio[..., None], shifted, tok_embeds)

    logits = decoder.forward_full(
        dec_p, hidden, pos, remat=remat
    )  # (B, P, V) f32

    targets = jnp.roll(token_ids, -1, axis=1)
    mask = batch["loss_mask"].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(
    config: AsrConfig,
    optimizer: optax.GradientTransformation,
    max_position: int = 8192,
    remat: bool = True,
) -> Callable:
    """Build the (un-jitted) train step fn; caller jits with shardings.

    ``remat`` (default on) checkpoints each decoder layer: the backward
    pass recomputes layer activations instead of saving all 28 layers'
    worth — the standard FLOPs-for-HBM trade for long-sequence training.
    """
    encoder = AudioEncoder(config.audio, remat=remat)
    decoder = TextDecoder(config.text, max_position=max_position)

    def train_step(state: TrainState, batch: dict):
        loss, grads = jax.value_and_grad(
            lambda prm: asr_loss(
                config, encoder, decoder, prm, batch, remat=remat
            )
        )(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1),
            loss,
        )

    return train_step
