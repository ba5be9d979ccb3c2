"""Decode engine: jitted prefill + device-side multi-token decode loop with
donated KV-cache carry and on-device sampling.

This is the TPU re-design of the reference Vulkan decode scheduler
(`vulkan/llama-vk.cpp:2099-2386` submitPass/process). Where the reference
records one command buffer per token and keeps up to two tokens in flight so
the host is never on the critical path, here a `lax.while_loop` *inside one
XLA program* feeds each sampled token straight back into the next forward
step — the host only receives a block of finished token ids (the analog of
the reference's single 4-byte ResultBuffer readback per token, batched). The
API surface mirrors llama.h: eval/tokenize/sample/get-set-kv-cache/timings
(`llama.h:36-168`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..models.llama import KVCache, LlamaParams, ModelConfig, init_kv_cache, llama_forward
from ..utils.jitopts import decode_jit
from .sampling import SamplerParams, sample_token


@dataclass(frozen=True)
class EngineConfig:
    n_ctx: int = 512
    kv_dtype: str = "bfloat16"  # the reference's f16_kv option (llama.h:56)
    batch: int = 1
    seed: int = 0
    decode_block: int = 16  # tokens decoded per device round-trip (1 = stream
    # every token; larger amortizes host latency)
    ctx_ring: bool = False  # history-ring KV: infinite generation without
    # the reference CLI's swap-and-re-eval (keeps ring_keep pinned rows +
    # the most recent n_ctx - ring_keep positions)
    ring_keep: int = 0
    dtype: str = "bfloat16"  # activation compute dtype; "float32" is the
    # numerics-oracle mode used for differential parity against the compiled
    # C reference (tests/test_reference_parity.py)
    attn_impl: str = "auto"  # forwarded to llama_forward ("einsum" = oracle)
    ggml_numerics: str | None = None  # "f16"/"q4_0": emulate the reference's
    # scalar numerics exactly (models/ggml_numerics.py); needs dense params
    # (load_model(dequantize=True)), dtype=float32, attn_impl=einsum,
    # kv_dtype=float32 — the --memory_f32 oracle configuration


@dataclass
class SessionState:
    """Host-side snapshot of inference state — parity with
    llama_get_kv_cache/llama_set_kv_cache (llama.h:91-106)."""

    k: np.ndarray
    v: np.ndarray
    n_past: int
    tokens: list[int]
    k_scale: np.ndarray | None = None  # int8 KV caches (ops/kv_quant.py)
    v_scale: np.ndarray | None = None
    pos: np.ndarray | None = None  # history-ring position plane


@dataclass
class Timings:
    """llama_print_timings parity (llama.cpp:1807-1827)."""

    t_load_us: float = 0.0
    t_prompt_us: float = 0.0
    n_prompt: int = 0
    t_eval_us: float = 0.0
    n_eval: int = 0

    def report(self) -> str:
        lines = [f"load time   = {self.t_load_us / 1e3:9.2f} ms"]
        if self.n_prompt:
            lines.append(
                f"prompt eval = {self.t_prompt_us / 1e3:9.2f} ms / {self.n_prompt} tokens"
                f" ({self.t_prompt_us / 1e3 / max(self.n_prompt, 1):.2f} ms/tok)"
            )
        if self.n_eval:
            lines.append(
                f"eval        = {self.t_eval_us / 1e3:9.2f} ms / {self.n_eval} tokens"
                f" ({self.t_eval_us / 1e3 / max(self.n_eval, 1):.2f} ms/tok,"
                f" {self.n_eval / (self.t_eval_us / 1e6):.2f} tok/s)"
            )
        return "\n".join(lines)


def make_decode_block(cfg: ModelConfig, ring_keep: int = 0,
                      dtype=jnp.bfloat16, attn_impl: str = "auto",
                      ggml_rounding: str | None = None):
    """Build the jitted device-side decode loop for a model config.

    Returns fn(params, tok0, cache, last_tokens, key, n_past, sp, n_steps,
    eos_id, stop_at_eos) → (tokens [n_steps], n_done, cache, last_tokens, key).
    The loop body runs the full quantized forward + sampler; the sampled token
    feeds the next iteration without leaving the device.
    """

    @partial(decode_jit, static_argnames=("sp", "n_steps"), donate_argnums=(2, 3, 4))
    def decode_block(params, tok0, cache, last_tokens, key, n_past, sp, n_steps):
        def scan_body(state, i):
            tok, cache, last, key = state
            logits, cache, _ = llama_forward(
                params, tok.reshape(1, 1), cache, n_past + i, cfg,
                ring_keep=ring_keep, dtype=dtype, attn_impl=attn_impl,
                ggml_rounding=ggml_rounding,
            )
            key, sub = jax.random.split(key)
            nxt = sample_token(logits[0, -1], last, sub, sp)
            last = jnp.roll(last, -1).at[-1].set(nxt)
            return (nxt, cache, last, key), nxt

        state = (tok0, cache, last_tokens, key)
        (tok, cache, last, key), toks = jax.lax.scan(
            scan_body, state, jnp.arange(n_steps, dtype=jnp.int32)
        )
        return toks, cache, last, key

    return decode_block


class Engine:
    def __init__(
        self,
        cfg: ModelConfig,
        params: LlamaParams,
        ecfg: EngineConfig = EngineConfig(),
    ):
        self.cfg = cfg
        self.params = params
        self.ecfg = ecfg
        self.kv_dtype = jnp.dtype(ecfg.kv_dtype)
        step = 32 if self.kv_dtype == jnp.int8 else 8
        if ecfg.n_ctx % step:
            raise ValueError(
                f"n_ctx must be a multiple of {step} "
                f"({'int8 KV tile' if step == 32 else 'KV tile'} constraint); "
                f"got {ecfg.n_ctx}"
            )
        self.timings = Timings()
        self.reset()

        cfg_ = cfg
        rk = ecfg.ring_keep
        act_dtype = jnp.dtype(ecfg.dtype)
        attn_impl = ecfg.attn_impl
        ggml_rounding = ecfg.ggml_numerics
        if ggml_rounding is not None and attn_impl == "auto":
            attn_impl = "einsum"

        @partial(decode_jit, static_argnames=("logits_all",))
        def _prefill(params, tokens, cache, n_past, last_idx, logits_all=False):
            return llama_forward(
                params, tokens, cache, n_past, cfg_,
                logits_all=logits_all, last_idx=last_idx, ring_keep=rk,
                dtype=act_dtype, attn_impl=attn_impl,
                ggml_rounding=ggml_rounding,
            )

        self._prefill = _prefill
        self._decode_block = make_decode_block(
            cfg, ring_keep=rk, dtype=act_dtype, attn_impl=attn_impl,
            ggml_rounding=ggml_rounding,
        )

    # --- state ---------------------------------------------------------

    def reset(self) -> None:
        self.cache = init_kv_cache(
            self.cfg, self.ecfg.batch, self.ecfg.n_ctx, dtype=self.kv_dtype,
            ring=self.ecfg.ctx_ring,
        )
        self.n_past = 0
        self.tokens: list[int] = []
        self.key = jax.random.key(self.ecfg.seed)

    def _ring_row(self, pos: int) -> int:
        """Host twin of models.llama.ring_phys."""
        s, keep = self.ecfg.n_ctx, self.ecfg.ring_keep
        return pos if pos < s else keep + (pos - keep) % (s - keep)

    def set_seed(self, seed: int) -> None:
        self.key = jax.random.key(seed)

    # --- eval (llama_eval parity) ---------------------------------------

    def eval(self, tokens: list[int] | np.ndarray, logits_all: bool = False):
        """Evaluate tokens at the current position; returns logits [T or 1, V].

        A final sampled token from a previous generate() is in self.tokens but
        not yet in the KV cache (the reference leaves it pending in `embd` the
        same way, main.cpp loop); it is prepended and evaluated here."""
        backlog = self.tokens[self.n_past :]
        new_toks = [int(t) for t in np.asarray(tokens)]
        full = list(backlog) + new_toks
        ring = self.ecfg.ctx_ring
        if not ring and self.n_past + len(full) > self.ecfg.n_ctx:
            raise ValueError(
                f"context overflow: n_past({self.n_past}) + n_tokens({len(full)})"
                f" > n_ctx({self.ecfg.n_ctx})"
            )
        t0 = time.perf_counter()

        def eval_chunk(chunk: list[int]):
            # bucket-pad T to a power of two: prefill compiles once per
            # bucket, not once per prompt length (~40 s/compile on a 7B).
            # Garbage KV rows past len(chunk) sit beyond n_past and are
            # overwritten before any query can attend to them. Ring caveat:
            # after a wrap the padded rows land on ring rows that still held
            # the OLDEST in-window history — those positions temporarily
            # vanish from attention (their pos plane marks them future) until
            # real tokens reach them. Bounded by bucket - t_real < t_real
            # rows per eval; the pinned ring_keep prefix is never touched.
            t_real = len(chunk)
            bucket = 1 << (t_real - 1).bit_length()
            if ring:
                bucket = min(bucket, self.ecfg.n_ctx - self._ring_row(self.n_past))
            else:
                bucket = min(bucket, self.ecfg.n_ctx - self.n_past)
            padded = chunk + [0] * (bucket - t_real)
            toks = jnp.asarray(np.asarray(padded, np.int32))[None]
            logits, self.cache, self._last_emb = self._prefill(
                self.params, toks, self.cache, jnp.int32(self.n_past),
                jnp.int32(t_real - 1), logits_all=logits_all,
            )
            self.n_past += t_real
            return np.asarray(logits)[0][:t_real] if logits_all else np.asarray(logits)[0]

        if ring:
            # chunk so one eval never crosses the ring's wrap row (the write
            # window [row, row+T) must stay contiguous in physical rows).
            # Chunks snap to the largest power of two that fits the room so
            # the padded shape stays a bounded bucket set (CLAUDE.md rule:
            # never derive traced-program shapes from runtime values)
            parts = []
            i = 0
            while i < len(full):
                room = self.ecfg.n_ctx - self._ring_row(self.n_past)
                take = min(len(full) - i, 1 << (room.bit_length() - 1))
                part = full[i : i + take]
                parts.append(eval_chunk(part))
                i += len(part)
            logits = np.concatenate(parts) if logits_all else parts[-1]
        else:
            logits = eval_chunk(full)
        if logits_all:
            logits = logits[len(backlog) :]
        self.tokens.extend(new_toks)
        self.timings.t_prompt_us += (time.perf_counter() - t0) * 1e6
        self.timings.n_prompt += len(full)
        return logits

    def get_embeddings(self) -> np.ndarray:
        """Final-norm activations of the last evaluated token
        (llama_get_embeddings parity, llama.h:115-118)."""
        return np.asarray(self._last_emb)[0]

    # --- generation ------------------------------------------------------

    def generate(
        self,
        prompt_tokens: list[int],
        n_predict: int,
        sp: SamplerParams = SamplerParams(),
        on_token: Callable[[int], bool] | None = None,
        eos_id: int = 2,
        ignore_eos: bool = False,
    ) -> list[int]:
        """Prefill the prompt, then decode up to n_predict tokens with the
        device-side loop, surfacing tokens to the host in blocks of
        ecfg.decode_block. on_token returns False to stop early."""
        assert self.ecfg.ctx_ring or (
            self.n_past + len(prompt_tokens) + n_predict <= self.ecfg.n_ctx
        ), "context overflow; use ctx_ring or ContextManager for infinite generation"
        if sp.repeat_last_n <= 0:
            # penalty disabled (reference semantics for repeat_last_n=0):
            # keep a 1-slot dummy window and neutralize the penalty factor
            from dataclasses import replace as _replace

            sp = _replace(sp, repeat_last_n=1, repeat_penalty=1.0)
            last = np.full(1, -1, np.int32)
        else:
            w = sp.repeat_last_n
            last = np.full(w, -1, np.int32)
            hist = (self.tokens + list(prompt_tokens))[-w:]
            if hist:
                last[-len(hist):] = hist
        last_tokens = jnp.asarray(last)

        logits = self.eval(prompt_tokens)
        self.key, sub = jax.random.split(self.key)
        tok = int(sample_token(jnp.asarray(logits[-1]), last_tokens, sub, sp))
        last_tokens = jnp.roll(last_tokens, -1).at[-1].set(tok)

        out: list[int] = []
        cache, key = self.cache, self.key
        t0 = time.perf_counter()
        n_eval = 0
        stop = False

        def surface(t: int) -> bool:
            """Append one sampled token; returns True if generation must stop."""
            nonlocal stop
            out.append(t)
            self.tokens.append(t)
            if on_token is not None and not on_token(t):
                stop = True
            if not ignore_eos and t == eos_id:
                stop = True
            return stop or len(out) >= n_predict

        surface(tok)  # first token, sampled on host from prefill logits
        while not stop and len(out) < n_predict:
            # n_steps is STATIC in the jitted block: snap to a power of two
            # (bounded program variants) and discard overshoot, instead of
            # compiling a fresh ~40s program per residual budget
            n_req = min(self.ecfg.decode_block, n_predict - len(out))
            n = min(1 << (n_req - 1).bit_length(), self.ecfg.decode_block)
            while not self.ecfg.ctx_ring and n > self.ecfg.n_ctx - self.n_past:
                n //= 2
            toks, cache, last_tokens, key = self._decode_block(
                self.params,
                jnp.int32(tok),
                cache,
                last_tokens,
                key,
                jnp.int32(self.n_past),
                sp,
                n,
            )
            block = [int(t) for t in np.asarray(toks)]
            # consume until eos / callback-stop / budget; overshoot beyond the
            # stop point is speculative device work and is discarded (its KV
            # rows sit past n_past and are overwritten before being attended)
            consumed = 0
            for t in block:
                consumed += 1
                if surface(t):
                    break
            n_eval += consumed
            # feeding tok evaluated it; of the consumed samples all but the
            # last are also evaluated -> n_past advances by `consumed`; the
            # final sample stays pending (eval() backlogs it, like the
            # reference's embd carry-over)
            self.n_past += consumed
            tok = block[consumed - 1]
        self.cache, self.key = cache, key
        self.timings.t_eval_us += (time.perf_counter() - t0) * 1e6
        self.timings.n_eval += n_eval
        return out[:n_predict]

    # --- session save/restore (llama_get/set_kv_cache parity) ------------

    def save_session(self) -> SessionState:
        c = self.cache
        return SessionState(
            k=np.asarray(c.k),
            v=np.asarray(c.v),
            n_past=self.n_past,
            tokens=list(self.tokens),
            k_scale=None if c.k_scale is None else np.asarray(c.k_scale),
            v_scale=None if c.v_scale is None else np.asarray(c.v_scale),
            pos=None if c.pos is None else np.asarray(c.pos),
        )

    def restore_session(self, s: SessionState) -> None:
        self.cache = KVCache(
            k=jnp.asarray(s.k),
            v=jnp.asarray(s.v),
            k_scale=None if s.k_scale is None else jnp.asarray(s.k_scale),
            v_scale=None if s.v_scale is None else jnp.asarray(s.v_scale),
            pos=None if s.pos is None else jnp.asarray(s.pos),
        )
        self.n_past = s.n_past
        self.tokens = list(s.tokens)
