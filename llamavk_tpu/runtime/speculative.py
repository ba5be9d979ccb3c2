"""Speculative decoding: a small draft model proposes, the target verifies.

Beyond the reference (its engine decodes strictly one token per pass;
vulkan/llama-vk.cpp:2099-2386) — the device-side decode-block structure
(runtime/engine.py) extends naturally to draft-verify:

  per round, ON DEVICE (one lax.scan body, nothing crosses to the host):
    1. the draft model decodes GAMMA tokens autoregressively (cheap);
    2. the target model evaluates all GAMMA positions in ONE forward —
       a [GAMMA, K] matmul streams the same weights as a [1, K] decode
       step, so verification costs roughly one decode step;
    3. accept the longest prefix where the draft agrees with the target
       argmax, then emit the target's own token at the first disagreement
       (or the bonus token when everything matched).

Greedy equivalence: the emitted stream is EXACTLY the target model's greedy
decode — the draft only changes how many tokens each round yields (1..GAMMA),
never their values. (tests/test_speculative.py asserts this with an
unrelated draft.)

Cache bookkeeping needs no rollback: rows past the accepted prefix hold
stale K/V but sit at positions >= n_past, which no query attends and the
next round overwrites — the same invariant the bucket-padded prefill and
decode overshoot already rely on.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models.llama import KVCache, LlamaParams, ModelConfig, init_kv_cache, llama_forward


@dataclass(frozen=True)
class SpecConfig:
    n_ctx: int = 512
    gamma: int = 4  # draft tokens proposed per round
    rounds_per_block: int = 8  # verify rounds per device round-trip
    kv_dtype: str = "bfloat16"


def make_spec_decode_block(cfg_t: ModelConfig, cfg_d: ModelConfig, gamma: int):
    """Jitted device-side speculative decode loop (greedy).

    Returns fn(params_t, params_d, tok0, cache_t, cache_d, n_past, n_rounds)
    -> (toks [n_rounds, gamma], counts [n_rounds], tok, cache_t, cache_d,
        n_past). Row r holds counts[r] valid emitted tokens."""

    @partial(jax.jit, static_argnames=("n_rounds",), donate_argnums=(3, 4))
    def spec_block(params_t, params_d, tok0, cache_t, cache_d, n_past, n_rounds):
        def round_body(state, _):
            tok, cache_t, cache_d, n_past = state

            # 1) draft gamma tokens, feeding each back (draft cache rows
            #    n_past..n_past+gamma-1 now hold [tok, d_0..d_{gamma-2}])
            def dstep(s, i):
                t, cd = s
                lg, cd, _ = llama_forward(
                    params_d, t.reshape(1, 1), cd, n_past + i, cfg_d
                )
                nt = jnp.argmax(lg[0, -1]).astype(jnp.int32)
                return (nt, cd), nt

            (_, cache_d), draft = jax.lax.scan(
                dstep, (tok, cache_d), jnp.arange(gamma, dtype=jnp.int32)
            )  # draft: [gamma]

            # 2) ONE target forward over [tok, d_0..d_{gamma-2}]
            seq = jnp.concatenate([tok.reshape(1), draft[:-1]])  # [gamma]
            lg, cache_t, _ = llama_forward(
                params_t, seq[None], cache_t, n_past, cfg_t, logits_all=True
            )
            y = jnp.argmax(lg[0], axis=-1).astype(jnp.int32)  # [gamma]

            # 3) longest agreeing prefix: k = #{i < gamma-1 leading with
            #    d_i == y_i}; emit d_0..d_{k-1} then y_k (correction/bonus)
            agree = draft[: gamma - 1] == y[: gamma - 1]  # [gamma-1]
            k = jnp.argmin(
                jnp.concatenate([agree, jnp.zeros(1, bool)])
            ).astype(jnp.int32)  # first False; gamma-1 if all True
            emitted = jnp.where(
                jnp.arange(gamma) < k, draft, y[jnp.minimum(k, gamma - 1)]
            )  # positions > k repeat the correction; count caps reads
            count = k + 1
            tok_next = y[k]
            return (tok_next, cache_t, cache_d, n_past + count), (emitted, count)

        state = (tok0, cache_t, cache_d, n_past)
        (tok, cache_t, cache_d, n_past), (toks, counts) = jax.lax.scan(
            round_body, state, None, length=n_rounds
        )
        return toks, counts, tok, cache_t, cache_d, n_past

    return spec_block


class SpeculativeEngine:
    """Greedy decode engine over a (target, draft) model pair.

    API mirrors Engine.generate for the greedy case; sampled (temp > 0)
    generation should use the plain Engine — speculative rejection sampling
    is a natural extension of the round body but is not implemented yet."""

    def __init__(
        self,
        cfg_t: ModelConfig,
        params_t: LlamaParams,
        cfg_d: ModelConfig,
        params_d: LlamaParams,
        scfg: SpecConfig = SpecConfig(),
    ):
        self.cfg_t, self.params_t = cfg_t, params_t
        self.cfg_d, self.params_d = cfg_d, params_d
        self.scfg = scfg
        self._block = make_spec_decode_block(cfg_t, cfg_d, scfg.gamma)

        def make_prefill(cfg, params):
            @jax.jit
            def _prefill(tokens, cache, last_idx):
                logits, cache, _ = llama_forward(
                    params, tokens, cache, jnp.int32(0), cfg, last_idx=last_idx
                )
                return logits[:, -1, :], cache

            return _prefill

        self._prefill_t = make_prefill(cfg_t, params_t)
        self._prefill_d = make_prefill(cfg_d, params_d)
        self.stats = {"rounds": 0, "accepted": 0, "emitted": 0}
        self.reset()

    def reset(self) -> None:
        dt = jnp.dtype(self.scfg.kv_dtype)
        self.cache_t = init_kv_cache(self.cfg_t, 1, self.scfg.n_ctx, dtype=dt)
        self.cache_d = init_kv_cache(self.cfg_d, 1, self.scfg.n_ctx, dtype=dt)
        self.n_past = 0

    def generate(self, prompt_tokens: list[int], n_predict: int,
                 eos_id: int = 2, ignore_eos: bool = False) -> list[int]:
        g = self.scfg.gamma
        assert (
            self.n_past + len(prompt_tokens) + n_predict + g + 1 <= self.scfg.n_ctx
        ), "context overflow"
        plen = len(prompt_tokens)
        bucket = 1 << (plen - 1).bit_length()
        bucket = min(bucket, self.scfg.n_ctx)
        padded = np.zeros(bucket, np.int32)
        padded[:plen] = prompt_tokens
        toks = jnp.asarray(padded)[None]
        logits_t, self.cache_t = self._prefill_t(
            toks, self.cache_t, jnp.int32(plen - 1)
        )
        _, self.cache_d = self._prefill_d(toks, self.cache_d, jnp.int32(plen - 1))
        self.n_past += plen
        tok = jnp.argmax(logits_t[0]).astype(jnp.int32)

        out = [int(tok)]
        if not ignore_eos and out[-1] == eos_id:
            return out
        npast_dev = jnp.int32(self.n_past)
        while len(out) < n_predict:
            toks_r, counts, tok, self.cache_t, self.cache_d, npast_dev = self._block(
                self.params_t, self.params_d, tok, self.cache_t, self.cache_d,
                npast_dev, self.scfg.rounds_per_block,
            )
            toks_h = np.asarray(toks_r)  # [R, gamma]
            counts_h = np.asarray(counts)
            stop = False
            for r in range(toks_h.shape[0]):
                c = int(counts_h[r])
                self.stats["rounds"] += 1
                self.stats["accepted"] += c - 1
                for t in toks_h[r, :c]:
                    out.append(int(t))
                    self.stats["emitted"] += 1
                    if (not ignore_eos and int(t) == eos_id) or len(out) >= n_predict:
                        stop = True
                        break
                if stop:
                    break
            if stop:
                break
        # device-side state ran ahead of any early stop; n_past tracks the
        # device value (stale rows past the stop point are masked/overwritten)
        self.n_past = int(npast_dev)
        return out[:n_predict]

    @property
    def acceptance_rate(self) -> float:
        r = self.stats["rounds"]
        return self.stats["accepted"] / max(r * (self.scfg.gamma - 1), 1)
