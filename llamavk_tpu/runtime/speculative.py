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
from ..utils.jitopts import decode_jit
from .sampling import SamplerParams, probs_from_logits


@dataclass(frozen=True)
class SpecConfig:
    n_ctx: int = 512
    gamma: int = 4  # draft tokens proposed per round
    # verify rounds per device round-trip. The round body is ONE lax.scan
    # body regardless of this value (trace/compile cost does not grow with
    # it); the axon tunnel's ~16 ms fixed dispatch amortizes across it, so
    # bigger is faster until the n_ctx headroom (rounds*gamma overshoot)
    # bites. Measured v5e 7B+1B gamma=4: 20.6 ms/round at 4, 18.6 at 8,
    # ~17.1 projected at 32 vs 16.6 in-program (tools/diag_spec_round.py).
    rounds_per_block: int = 16
    kv_dtype: str = "bfloat16"


def make_spec_decode_block(cfg_t: ModelConfig, cfg_d: ModelConfig, gamma: int):
    """Jitted device-side speculative decode loop (greedy).

    Returns fn(params_t, params_d, tok0, cache_t, cache_d, n_past, n_rounds)
    -> (toks [n_rounds, gamma], counts [n_rounds], tok, cache_t, cache_d,
        n_past). Row r holds counts[r] valid emitted tokens."""

    @partial(decode_jit, static_argnames=("n_rounds",), donate_argnums=(3, 4))
    def spec_block(params_t, params_d, tok0, cache_t, cache_d, n_past, n_rounds):
        def round_body(state, _):
            tok, cache_t, cache_d, n_past = state

            # 1) draft gamma tokens, feeding each back (draft cache rows
            #    n_past..n_past+gamma-1 now hold [tok, d_0..d_{gamma-2}]).
            #    The gamma-th step looks wasteful (d_{gamma-1} is never
            #    verified) but it is what WRITES d_{gamma-2}'s K/V row into
            #    the draft cache — without it a fully-accepted round would
            #    leave a hole the next round's drafts attend through.
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
            # (measured null result, v5e 2026-08-19: unroll=True here does
            # NOT close the in-round draft-step gap — 18.89 vs 18.57
            # ms/round at gamma=4; tools/diag_spec_round.py)

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




def lookup_draft_batched(ctx, toks, n_past, gamma: int):
    """Batched 2-gram prompt-lookup drafting (the single shared matcher).

    ctx [B, S] token history (rows < n_past[b] valid), toks [B] pending
    tokens, n_past [B] -> (seq [B, gamma] verify inputs, draft [B, gamma-1]
    with -1 poison when no match, p [B] match positions or -1)."""
    bsz, s = ctx.shape
    idx = jnp.arange(s, dtype=jnp.int32)[None]
    prev = jnp.take_along_axis(
        ctx, jnp.maximum(n_past - 1, 0)[:, None], 1
    )[:, 0]
    shifted = jnp.roll(ctx, 1, axis=1)  # shifted[:, p] = ctx[:, p-1]
    match = (
        (idx >= 1)
        & (idx <= (n_past - gamma)[:, None])
        & (ctx == toks[:, None])
        & (shifted == prev[:, None])
    )
    p = jnp.max(jnp.where(match, idx, -1), axis=1)
    draft = jax.vmap(
        lambda c, pp: jax.lax.dynamic_slice(
            c, (jnp.maximum(pp, 0) + 1,), (gamma - 1,)
        )
    )(ctx, p)
    draft = jnp.where((p >= 0)[:, None], draft, jnp.int32(-1))
    seq = jnp.concatenate([toks[:, None], draft], axis=1)
    return seq, draft, p


def first_reject(acc):
    """acc [B, gamma-1] accept flags -> k [B]: index of the first rejection
    (gamma-1 when every draft position was accepted)."""
    bsz = acc.shape[0]
    return jnp.argmin(
        jnp.concatenate([acc, jnp.zeros((bsz, 1), bool)], axis=1), axis=1
    ).astype(jnp.int32)


def assemble_emitted(k, draft, corr, gamma: int):
    """Round outputs: emitted [B, gamma] = accepted draft prefix then the
    correction/bonus token, count [B] = k + 1 valid entries per row."""
    bsz = draft.shape[0]
    draft_pad = jnp.concatenate(
        [draft, jnp.zeros((bsz, 1), jnp.int32)], axis=1
    )
    emitted = jnp.where(
        jnp.arange(gamma)[None] < k[:, None], draft_pad, corr[:, None]
    )
    return emitted, k + 1


def make_lookup_decode_block(cfg_t: ModelConfig, gamma: int, n_ctx: int):
    """Draft-model-free speculative decoding: prompt-lookup (n-gram) drafts.

    The draft for the next gamma-1 positions is the continuation of the most
    recent earlier occurrence of the current 2-gram (prev, tok) in the
    consumed context. Drafting costs a handful of [S]-wide vector ops — no
    second model, no extra weight streaming — so one round costs essentially
    ONE plain decode step: the verify forward over gamma<=8 positions streams
    the same weights as a 1-token step (decode is HBM-bound, and the flash
    kernel pads query blocks to 8 anyway). Tokens per round is 1 + accepted,
    so the scheme never trails plain decode by more than the (near-zero)
    matching overhead, and wins whenever generated text revisits n-grams of
    its own context (quotes, code, structured output).

    Greedy equivalence: the emitted stream is EXACTLY the target's greedy
    decode — drafts only change how many tokens a round yields, never their
    values. Returns fn(params_t, tok0, ctx, cache, n_past, n_rounds) ->
    (toks [n_rounds, gamma], counts [n_rounds], tok, ctx, cache, n_past)
    where ctx is the [n_ctx] int32 device-side token history (rows < n_past
    valid)."""

    @partial(decode_jit, static_argnames=("n_rounds",), donate_argnums=(2, 3))
    def lookup_block(params_t, tok0, ctx, cache_t, n_past, n_rounds):
        def round_body(state, _):
            tok, ctx, cache_t, n_past = state
            seq2, draft2, _ = lookup_draft_batched(
                ctx[None], tok.reshape(1), n_past.reshape(1), gamma
            )
            seq, draft = seq2[0], draft2[0]
            lg, cache_t, _ = llama_forward(
                params_t, seq[None], cache_t, n_past, cfg_t, logits_all=True
            )
            y = jnp.argmax(lg[0], axis=-1).astype(jnp.int32)  # [gamma]

            k = first_reject((draft == y[: gamma - 1])[None])[0]
            tok_next = y[k]
            emitted2, count2 = assemble_emitted(
                k[None], draft2, tok_next.reshape(1), gamma
            )
            emitted, count = emitted2[0], count2[0]
            # consumed-input rows: seq[0..k] are valid, the rest junk that
            # the next round overwrites (rows >= n_past are never read)
            ctx = jax.lax.dynamic_update_slice(ctx, seq, (n_past,))
            return (tok_next, ctx, cache_t, n_past + count), (emitted, count)

        state = (tok0, jnp.asarray(ctx), cache_t, jnp.asarray(n_past))
        (tok, ctx, cache_t, n_past), (toks, counts) = jax.lax.scan(
            round_body, state, None, length=n_rounds
        )
        return toks, counts, tok, ctx, cache_t, n_past

    return lookup_block


def make_lookup_sample_block(cfg_t: ModelConfig, gamma: int, n_ctx: int,
                             sp: SamplerParams):
    """Sampled prompt-lookup speculation. The draft is DETERMINISTIC (a point
    mass at the context continuation), so rejection sampling collapses:
    accept d_i with probability p_t(d_i); on rejection sample from p_t with
    d_i zeroed out, renormalized (= the residual distribution). Emitted
    tokens are therefore distributed EXACTLY as target-only sampling from
    the transformed (temp/top-k/top-p) distribution — see
    tests/test_speculative.py::test_lookup_sampling_is_unbiased.

    repeat_penalty is not folded in (callers assert it off): its window
    would have to evolve inside the round."""

    @partial(decode_jit, static_argnames=("n_rounds",), donate_argnums=(2, 3))
    def lookup_sample_block(params_t, tok0, ctx, cache_t, n_past, key,
                            n_rounds):
        def round_body(state, _):
            tok, ctx, cache_t, n_past, key = state
            seq2, draft2, p2 = lookup_draft_batched(
                ctx[None], tok.reshape(1), n_past.reshape(1), gamma
            )
            seq, draft, p = seq2[0], draft2[0], p2[0]
            lg, cache_t, _ = llama_forward(
                params_t, seq[None], cache_t, n_past, cfg_t, logits_all=True
            )
            pt_all = jax.vmap(
                lambda l: probs_from_logits(l, sp.top_k, sp.top_p, sp.temp)
            )(lg[0])  # [gamma, V]

            ids = jnp.arange(gamma - 1)
            key, ku, kc = jax.random.split(key, 3)
            us = jax.random.uniform(ku, (max(gamma - 1, 1),))[: gamma - 1]
            # deterministic proposal: accept with prob p_t(d_i); a -1 draft
            # (no match) takes p_t = 0 -> certain rejection, plain step
            safe = jnp.maximum(draft, 0)
            acc = (us < pt_all[ids, safe]) & (draft >= 0)
            k = first_reject(acc[None])[0]

            # residual at the rejection point: p_t with the draft token
            # removed (only when a real draft existed — a no-match round
            # keeps plain p_t); bonus (k == gamma-1): plain p_t
            pt_k = pt_all[k]
            safe_pad = jnp.concatenate([safe, jnp.zeros(1, jnp.int32)])
            rej_tok = safe_pad[jnp.minimum(k, gamma - 1)]
            drop = (k < gamma - 1) & (p >= 0)
            resid = pt_k.at[rej_tok].multiply(jnp.where(drop, 0.0, 1.0))
            resid = resid / jnp.maximum(resid.sum(), 1e-30)
            corr = jax.random.categorical(
                kc, jnp.log(resid + 1e-30)
            ).astype(jnp.int32)
            emitted2, count2 = assemble_emitted(
                k[None], draft2, corr.reshape(1), gamma
            )
            emitted, count = emitted2[0], count2[0]
            ctx = jax.lax.dynamic_update_slice(ctx, seq, (n_past,))
            return (corr, ctx, cache_t, n_past + count, key), (emitted, count)

        state = (tok0, ctx, cache_t, n_past, key)
        (tok, ctx, cache_t, n_past, key), (toks, counts) = jax.lax.scan(
            round_body, state, None, length=n_rounds
        )
        return toks, counts, tok, ctx, cache_t, n_past, key

    return lookup_sample_block


def make_spec_sample_block(cfg_t, cfg_d, gamma, sp_t: SamplerParams,
                           sp_d: SamplerParams):
    """Sampled speculative decoding: standard rejection sampling over the
    TRANSFORMED distributions (temperature/top-k/top-p — exactly what the
    plain sampler draws from), so the emitted stream is distributed exactly
    as target-only sampling:

      accept d_i with prob min(1, p_t(d_i) / p_d(d_i)); on the first
      rejection sample from normalize(max(p_t - p_d, 0)); if every draft
      was accepted, the bonus token samples from p_t at the last position.

    Repeat-penalty is not folded in (the caller asserts it is off): its
    window would have to evolve inside the round on both models identically.
    """

    @partial(decode_jit, static_argnames=("n_rounds",), donate_argnums=(3, 4))
    def spec_sample_block(params_t, params_d, tok0, cache_t, cache_d, n_past,
                          key, n_rounds):
        def round_body(state, _):
            tok, cache_t, cache_d, n_past, key = state

            def dstep(s, i):
                t, cd, kk = s
                lg, cd, _ = llama_forward(
                    params_d, t.reshape(1, 1), cd, n_past + i, cfg_d
                )
                pd = probs_from_logits(
                    lg[0, -1], sp_d.top_k, sp_d.top_p, sp_d.temp
                )
                kk, sub = jax.random.split(kk)
                nt = jax.random.categorical(
                    sub, jnp.log(pd + 1e-30)
                ).astype(jnp.int32)
                return (nt, cd, kk), (nt, pd)

            (_, cache_d, key), (draft, pd_all) = jax.lax.scan(
                dstep, (tok, cache_d, key), jnp.arange(gamma, dtype=jnp.int32)
            )  # draft [gamma], pd_all [gamma, V]

            seq = jnp.concatenate([tok.reshape(1), draft[:-1]])
            lg, cache_t, _ = llama_forward(
                params_t, seq[None], cache_t, n_past, cfg_t, logits_all=True
            )
            pt_all = jax.vmap(
                lambda l: probs_from_logits(l, sp_t.top_k, sp_t.top_p, sp_t.temp)
            )(lg[0])  # [gamma, V]

            idx = jnp.arange(gamma - 1)
            key, ku, kc = jax.random.split(key, 3)
            us = jax.random.uniform(ku, (max(gamma - 1, 1),))[: gamma - 1]
            ratio = pt_all[idx, draft[: gamma - 1]] / jnp.maximum(
                pd_all[idx, draft[: gamma - 1]], 1e-30
            )
            acc = us < jnp.minimum(ratio, 1.0)
            k = jnp.argmin(
                jnp.concatenate([acc, jnp.zeros(1, bool)])
            ).astype(jnp.int32)  # first rejection; gamma-1 if none

            # correction (residual) or bonus (k == gamma-1) distribution
            sub_pd = jnp.where(k < gamma - 1, pd_all[k], jnp.zeros_like(pd_all[k]))
            resid = jnp.maximum(pt_all[k] - sub_pd, 0.0)
            resid = resid / jnp.maximum(resid.sum(), 1e-30)
            corr = jax.random.categorical(
                kc, jnp.log(resid + 1e-30)
            ).astype(jnp.int32)
            emitted = jnp.where(jnp.arange(gamma) < k, draft, corr)
            count = k + 1
            return (corr, cache_t, cache_d, n_past + count, key), (emitted, count)

        state = (tok0, cache_t, cache_d, n_past, key)
        (tok, cache_t, cache_d, n_past, key), (toks, counts) = jax.lax.scan(
            round_body, state, None, length=n_rounds
        )
        return toks, counts, tok, cache_t, cache_d, n_past, key

    return spec_sample_block


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
        self._sample_blocks: dict = {}  # (sp_t, sp_d) -> compiled block

        def make_prefill(cfg):
            # params is an ARGUMENT: closure capture would bake multi-GB
            # weights into the program as constants (and the axon AOT path
            # would serialize them through the tunnel on every compile)
            @decode_jit
            def _prefill(params, tokens, cache, last_idx):
                logits, cache, _ = llama_forward(
                    params, tokens, cache, jnp.int32(0), cfg, last_idx=last_idx
                )
                return logits[:, -1, :], cache

            return _prefill

        self._prefill_t = partial(make_prefill(cfg_t), params_t)
        self._prefill_d = partial(make_prefill(cfg_d), params_d)
        self.stats = {"rounds": 0, "accepted": 0, "emitted": 0}
        self.reset()

    def reset(self) -> None:
        dt = jnp.dtype(self.scfg.kv_dtype)
        self.cache_t = init_kv_cache(self.cfg_t, 1, self.scfg.n_ctx, dtype=dt)
        self.cache_d = init_kv_cache(self.cfg_d, 1, self.scfg.n_ctx, dtype=dt)
        self.n_past = 0

    def generate(self, prompt_tokens: list[int], n_predict: int,
                 eos_id: int = 2, ignore_eos: bool = False,
                 sp: SamplerParams | None = None,
                 draft_sp: SamplerParams | None = None,
                 seed: int = 0) -> list[int]:
        """Single-shot generation (the engine resets itself first).

        sp=None or sp.temp <= 0: greedy draft-verify (output equals plain
        target greedy). Otherwise: speculative rejection sampling — emitted
        tokens are distributed exactly as target-only sampling from the
        transformed (temp/top-k/top-p) distribution. repeat_penalty must be
        off (1.0): its window would have to evolve within rounds."""
        sampled = sp is not None and sp.temp > 0
        if sampled:
            assert sp.repeat_penalty == 1.0, (
                "speculative sampling does not support repeat_penalty"
            )
            draft_sp = draft_sp or sp
        self.reset()
        g = self.scfg.gamma
        # device blocks always run rounds_per_block full rounds; the last
        # block can overshoot the budget by up to R*gamma rows of cache
        # writes, so reserve that headroom against n_ctx
        headroom = self.scfg.rounds_per_block * g + g + 1
        assert (
            len(prompt_tokens) + n_predict + headroom <= self.scfg.n_ctx
        ), "context overflow (need rounds_per_block*gamma headroom)"
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
        key = jax.random.key(seed)
        if sampled:
            from .sampling import probs_from_logits as _pfl

            key, k0 = jax.random.split(key)
            p0 = _pfl(logits_t[0], sp.top_k, sp.top_p, sp.temp)
            tok = jax.random.categorical(k0, jnp.log(p0 + 1e-30)).astype(jnp.int32)
            blk_key = (sp, draft_sp)
            if blk_key not in self._sample_blocks:
                self._sample_blocks[blk_key] = make_spec_sample_block(
                    self.cfg_t, self.cfg_d, self.scfg.gamma, sp, draft_sp
                )
            block = self._sample_blocks[blk_key]
        else:
            tok = jnp.argmax(logits_t[0]).astype(jnp.int32)
            block = None

        out = [int(tok)]
        if not ignore_eos and out[-1] == eos_id:
            return out
        npast_dev = jnp.int32(self.n_past)
        while len(out) < n_predict:
            if sampled:
                (toks_r, counts, tok, self.cache_t, self.cache_d, npast_dev,
                 key) = block(
                    self.params_t, self.params_d, tok, self.cache_t,
                    self.cache_d, npast_dev, key, self.scfg.rounds_per_block,
                )
            else:
                toks_r, counts, tok, self.cache_t, self.cache_d, npast_dev = (
                    self._block(
                        self.params_t, self.params_d, tok, self.cache_t,
                        self.cache_d, npast_dev, self.scfg.rounds_per_block,
                    )
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
        # the device ran ahead of any early stop; the HOST-consumed prefix is
        # the only valid context: prompt rows + every consumed token except
        # the final one (which is pending, never evaluated) — matching
        # Engine.generate's n_past accounting
        out = out[:n_predict]
        self.n_past = plen + max(len(out) - 1, 0)
        return out

    @property
    def acceptance_rate(self) -> float:
        r = self.stats["rounds"]
        return self.stats["accepted"] / max(r * (self.scfg.gamma - 1), 1)


class LookupEngine:
    """Greedy decode with prompt-lookup (n-gram) speculative drafts.

    No draft model: drafts come from the context itself, so a round costs
    ~one plain decode step and yields 1..gamma tokens. The emitted stream is
    exactly the target's greedy decode."""

    def __init__(self, cfg: ModelConfig, params: LlamaParams,
                 scfg: SpecConfig = SpecConfig()):
        self.cfg, self.params = cfg, params
        self.scfg = scfg
        self._block = make_lookup_decode_block(cfg, scfg.gamma, scfg.n_ctx)
        self._sample_blocks: dict = {}  # sp -> compiled sampled block

        @decode_jit
        def _prefill(params, tokens, cache, last_idx):
            logits, cache, _ = llama_forward(
                params, tokens, cache, jnp.int32(0), cfg, last_idx=last_idx
            )
            return logits[:, -1, :], cache

        self._prefill = _prefill
        self.stats = {"rounds": 0, "accepted": 0, "emitted": 0}
        self.reset()

    def reset(self) -> None:
        self.cache = init_kv_cache(
            self.cfg, 1, self.scfg.n_ctx, dtype=jnp.dtype(self.scfg.kv_dtype)
        )
        self.n_past = 0

    def generate(self, prompt_tokens: list[int], n_predict: int,
                 eos_id: int = 2, ignore_eos: bool = False,
                 sp: SamplerParams | None = None, seed: int = 0) -> list[int]:
        """sp=None or sp.temp <= 0: greedy (output equals plain greedy).
        Otherwise sampled lookup speculation: emitted tokens are distributed
        exactly as target-only sampling (deterministic-proposal rejection
        scheme, see make_lookup_sample_block). repeat_penalty must be off."""
        sampled = sp is not None and sp.temp > 0
        if sampled:
            assert sp.repeat_penalty == 1.0, (
                "lookup sampling does not support repeat_penalty"
            )
        self.reset()
        g = self.scfg.gamma
        headroom = self.scfg.rounds_per_block * g + g + 1
        assert (
            len(prompt_tokens) + n_predict + headroom <= self.scfg.n_ctx
        ), "context overflow (need rounds_per_block*gamma headroom)"
        plen = len(prompt_tokens)
        bucket = min(1 << (plen - 1).bit_length(), self.scfg.n_ctx)
        padded = np.zeros(bucket, np.int32)
        padded[:plen] = prompt_tokens
        toks = jnp.asarray(padded)
        logits, self.cache = self._prefill(
            self.params, toks[None], self.cache, jnp.int32(plen - 1)
        )
        self.n_past += plen
        ctx = jnp.zeros(self.scfg.n_ctx, jnp.int32)
        ctx = jax.lax.dynamic_update_slice(ctx, toks[:plen], (0,))

        key = jax.random.key(seed)
        if sampled:
            key, k0 = jax.random.split(key)
            p0 = probs_from_logits(logits[0], sp.top_k, sp.top_p, sp.temp)
            tok = jax.random.categorical(k0, jnp.log(p0 + 1e-30)).astype(jnp.int32)
            if sp not in self._sample_blocks:
                self._sample_blocks[sp] = make_lookup_sample_block(
                    self.cfg, g, self.scfg.n_ctx, sp
                )
            block = self._sample_blocks[sp]
        else:
            tok = jnp.argmax(logits[0]).astype(jnp.int32)
            block = None
        out = [int(tok)]
        if not ignore_eos and out[-1] == eos_id:
            return out
        npast_dev = jnp.int32(self.n_past)
        while len(out) < n_predict:
            if sampled:
                toks_r, counts, tok, ctx, self.cache, npast_dev, key = block(
                    self.params, tok, ctx, self.cache, npast_dev, key,
                    self.scfg.rounds_per_block,
                )
            else:
                toks_r, counts, tok, ctx, self.cache, npast_dev = self._block(
                    self.params, tok, ctx, self.cache, npast_dev,
                    self.scfg.rounds_per_block,
                )
            toks_h = np.asarray(toks_r)
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
        out = out[:n_predict]
        self.n_past = plen + max(len(out) - 1, 0)
        return out

    @property
    def acceptance_rate(self) -> float:
        r = self.stats["rounds"]
        return self.stats["accepted"] / max(r * (self.scfg.gamma - 1), 1)
