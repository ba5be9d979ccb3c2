"""On-device top-k / top-p / repeat-penalty sampling.

Semantics of the reference CPU sampler `llama_sample_top_p_top_k`
(`llama.cpp:1368-1459`) and its fully-on-GPU shader twin KernelThinFp16Output
(`vulkan/llama-vk.hlsl:923-1402`), re-expressed as XLA ops so the sampled
token id is produced on device and only 4 bytes cross to the host:

  1. repetition penalty on tokens present in the last-N window: scaled logit
     is divided by `repeat_penalty` when positive, multiplied when negative
     (CTRL-paper style);
  2. temperature scale 1/temp (temp <= 0 → pure greedy argmax);
  3. keep top-k by logit;
  4. softmax over kept; top-p: keep the smallest prefix of the
     descending-prob order whose cumulative prob reaches top_p (the crossing
     token is included);
  5. draw from the renormalized distribution (threefry key carried in state).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplerParams:
    top_k: int = 40
    top_p: float = 0.95
    temp: float = 0.8
    repeat_penalty: float = 1.10
    repeat_last_n: int = 64  # size of the penalty window


def _apply_repeat_penalty(
    logits: jax.Array,  # [V] f32
    last_tokens: jax.Array,  # [W] int32, padded with -1
    scale: float,
    repeat_penalty: float,
) -> jax.Array:
    v = logits.shape[-1]
    seen = jnp.zeros((v,), bool).at[jnp.where(last_tokens >= 0, last_tokens, 0)].set(
        last_tokens >= 0
    )
    scaled = logits * scale
    penalized = jnp.where(
        logits < 0.0, scaled * repeat_penalty, scaled / repeat_penalty
    )
    return jnp.where(seen, penalized, scaled)


@partial(jax.jit, static_argnames=("sp",))
def sample_token(
    logits: jax.Array,  # [V] f32 (single position)
    last_tokens: jax.Array,  # [W] int32, -1 padded
    key: jax.Array,  # jax.random key
    sp: SamplerParams,
) -> jax.Array:
    """Returns a scalar int32 token id."""
    v = logits.shape[-1]
    if sp.temp <= 0.0:
        # greedy; argmax picks the lowest index among ties like the reference
        return jnp.argmax(logits).astype(jnp.int32)

    scaled = _apply_repeat_penalty(logits, last_tokens, 1.0 / sp.temp, sp.repeat_penalty)

    k = v if sp.top_k <= 0 else min(sp.top_k, v)
    top_vals, top_idx = jax.lax.top_k(scaled, k)  # descending
    probs = jax.nn.softmax(top_vals)
    if sp.top_p < 1.0:
        csum = jnp.cumsum(probs)
        # keep entries whose *preceding* cumulative mass is < top_p
        # (the token that crosses the threshold stays, llama.cpp:1440-1448)
        keep = jnp.concatenate([jnp.ones((1,), bool), csum[:-1] < sp.top_p])
        probs = jnp.where(keep, probs, 0.0)
    choice = jax.random.categorical(key, jnp.log(probs + 1e-30))
    return top_idx[choice].astype(jnp.int32)


sample_batched = jax.vmap(sample_token, in_axes=(0, 0, 0, None))


def sample_logits_host(
    logits, last_tokens, sp: SamplerParams, rng: "np.random.Generator"
):
    """NumPy twin of sample_token for parity tests (the reference scalar
    implementation idiom)."""
    import numpy as np

    logits = np.asarray(logits, np.float32)
    if sp.temp <= 0.0:
        return int(logits.argmax())
    scale = 1.0 / sp.temp
    scaled = logits * scale
    for t in set(int(t) for t in last_tokens if t >= 0):
        scaled[t] = (
            logits[t] * scale * sp.repeat_penalty
            if logits[t] < 0
            else logits[t] * scale / sp.repeat_penalty
        )
    k = len(logits) if sp.top_k <= 0 else min(sp.top_k, len(logits))
    order = np.argsort(-scaled, kind="stable")[:k]
    vals = scaled[order]
    probs = np.exp(vals - vals.max())
    probs /= probs.sum()
    if sp.top_p < 1.0:
        csum = np.cumsum(probs)
        cut = int(np.searchsorted(csum, sp.top_p) + 1)
        probs = probs[:cut]
        order = order[:cut]
        probs = probs / probs.sum()
    return int(order[rng.choice(len(probs), p=probs)])


# --- vectorized sampler (continuous batching: per-slot parameters) ----------


def sample_token_dyn(
    logits: jax.Array,  # [V] f32
    last_tokens: jax.Array,  # [W] int32, -1 padded
    key: jax.Array,
    top_k: int,  # static (max pool size)
    top_p: jax.Array,  # traced scalars — per-request values under vmap
    temp: jax.Array,
    repeat_penalty: jax.Array,
) -> jax.Array:
    """sample_token with traced sampling params; temp <= 0 selects greedy."""
    v = logits.shape[-1]
    scale = jnp.where(temp > 0, 1.0 / jnp.maximum(temp, 1e-6), 1.0)
    scaled = _apply_repeat_penalty(logits, last_tokens, scale, repeat_penalty)

    k = v if top_k <= 0 else min(top_k, v)
    top_vals, top_idx = jax.lax.top_k(scaled, k)
    probs = jax.nn.softmax(top_vals)
    csum = jnp.cumsum(probs)
    keep = jnp.concatenate([jnp.ones((1,), bool), csum[:-1] < top_p])
    probs = jnp.where(keep, probs, 0.0)
    choice = jax.random.categorical(key, jnp.log(probs + 1e-30))
    sampled = top_idx[choice].astype(jnp.int32)
    greedy = jnp.argmax(logits).astype(jnp.int32)
    return jnp.where(temp > 0, sampled, greedy)


# [B]-batched: per-row logits/history/keys/params (top_k static shared)
sample_tokens_batched = jax.vmap(
    sample_token_dyn, in_axes=(0, 0, 0, None, 0, 0, 0)
)


def probs_from_logits(
    logits: jax.Array,  # [V] f32
    top_k: int,  # static
    top_p: float,
    temp: float,
) -> jax.Array:
    """The full-vocab probability distribution sample_token draws from
    (temperature + top-k + top-p, renormalized; zero outside the kept set).

    Speculative rejection sampling needs the actual distributions — both the
    draft's and the target's — not just a draw, so this factors the transform
    out of the samplers. Greedy (temp <= 0) is a point mass on the argmax."""
    v = logits.shape[-1]
    greedy = jnp.zeros(v).at[jnp.argmax(logits)].set(1.0)
    scaled = logits / jnp.maximum(temp, 1e-6)
    k = v if top_k <= 0 else min(top_k, v)
    top_vals, top_idx = jax.lax.top_k(scaled, k)
    probs = jax.nn.softmax(top_vals)
    csum = jnp.cumsum(probs)
    keep = jnp.concatenate([jnp.ones((1,), bool), csum[:-1] < top_p])
    probs = jnp.where(keep, probs, 0.0)
    probs = probs / probs.sum()
    full = jnp.zeros(v).at[top_idx].set(probs)
    return jnp.where(temp > 0, full, greedy)


def probs_from_logits_dyn(
    logits: jax.Array,  # [V] f32
    last_tokens: jax.Array,  # [W] int32, -1 padded (repeat-penalty window)
    top_k: int,  # static
    top_p: jax.Array,  # traced scalars — per-request values under vmap
    temp: jax.Array,
    repeat_penalty: jax.Array,
) -> jax.Array:
    """Full-vocab distribution sample_token_dyn draws from (repeat penalty +
    temperature + top-k + top-p). Greedy (temp <= 0) is a point mass on the
    raw argmax, exactly matching sample_token_dyn's greedy branch — so one
    code path serves mixed greedy/sampled batches (lookup speculation)."""
    v = logits.shape[-1]
    greedy = jnp.zeros(v).at[jnp.argmax(logits)].set(1.0)
    scale = jnp.where(temp > 0, 1.0 / jnp.maximum(temp, 1e-6), 1.0)
    scaled = _apply_repeat_penalty(logits, last_tokens, scale, repeat_penalty)
    k = v if top_k <= 0 else min(top_k, v)
    top_vals, top_idx = jax.lax.top_k(scaled, k)
    probs = jax.nn.softmax(top_vals)
    csum = jnp.cumsum(probs)
    keep = jnp.concatenate([jnp.ones((1,), bool), csum[:-1] < top_p])
    probs = jnp.where(keep, probs, 0.0)
    probs = probs / probs.sum()
    full = jnp.zeros(v).at[top_idx].set(probs)
    return jnp.where(temp > 0, full, greedy)


# [B]-batched twin (top_k static shared)
probs_batched_dyn = jax.vmap(
    probs_from_logits_dyn, in_axes=(0, 0, None, 0, 0, 0)
)
