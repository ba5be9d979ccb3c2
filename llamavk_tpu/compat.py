"""llama.h-shaped compatibility API.

The reference's public surface is a C ABI (`llama.h:36-168`): context
lifecycle, eval, tokenize, sampling, KV-cache snapshot, timings. This module
exposes the same functions under the same names over the TPU engine, so code
written against the reference's Python bindings ports by changing one import.
Each function cites the llama.h declaration it mirrors.

    from llamavk_tpu import compat as llama

    ctx = llama.llama_init_from_file("ggml-model-q4_0.bin",
                                     llama.llama_context_default_params())
    ids = llama.llama_tokenize(ctx, b" Hello", add_bos=True)
    llama.llama_eval(ctx, ids, n_past=0)
    tok = llama.llama_sample_top_p_top_k(ctx, ids, 40, 0.95, 0.8, 1.1)
    print(llama.llama_token_to_str(ctx, tok))
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .models.loader import load_model
from .runtime.engine import Engine, EngineConfig, SessionState
from .runtime.sampling import SamplerParams, sample_token
from .tokenizer import Tokenizer
from .utils.trace import system_info


@dataclass
class llama_context_params:
    """llama_context_params (llama.h:50-68)."""

    n_ctx: int = 512
    n_parts: int = -1  # auto
    seed: int = 0
    f16_kv: bool = True
    logits_all: bool = False
    vocab_only: bool = False
    use_mmap: bool = True  # always mmap-backed here
    use_mlock: bool = False
    embedding: bool = True


@dataclass
class llama_context:
    """Opaque context handle (llama_context, llama.cpp:105-157)."""

    engine: Engine | None
    tokenizer: Tokenizer
    params: llama_context_params
    logits: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    _tensor_map: dict | None = None


def llama_context_default_params() -> llama_context_params:
    """llama_context_default_params (llama.h:70, llama.cpp:702-718)."""
    return llama_context_params()


def llama_mmap_supported() -> bool:  # llama.h:72
    return True


def llama_mlock_supported() -> bool:  # llama.h:73
    return False  # device HBM, not host pages — nothing to mlock


def llama_init_from_file(path: str, params: llama_context_params | None = None):
    """llama_init_from_file (llama.h:78-80)."""
    p = params or llama_context_default_params()
    import time as _time

    n_parts = None if p.n_parts < 0 else p.n_parts
    if p.vocab_only:
        from .formats.ggml_io import CheckpointReader

        reader = CheckpointReader(path, n_parts)
        return llama_context(engine=None, tokenizer=Tokenizer(reader.vocab), params=p)
    t0 = _time.perf_counter()
    cfg, model_params, tok = load_model(path, n_parts=n_parts)
    eng = Engine(
        cfg,
        model_params,
        EngineConfig(
            n_ctx=p.n_ctx,
            kv_dtype="bfloat16" if p.f16_kv else "float32",
            seed=p.seed,
        ),
    )
    eng.timings.t_load_us = (_time.perf_counter() - t0) * 1e6
    return llama_context(engine=eng, tokenizer=tok, params=p)


def llama_free(ctx: llama_context) -> None:
    """llama_free (llama.h:82) — buffers are GC'd; drop references."""
    ctx.engine = None


def llama_model_quantize(fname_inp: str, fname_out: str, itype: int) -> int:
    """llama_model_quantize (llama.h:85-88). Returns 0 on success."""
    from .cli.quantize import quantize_file

    quantize_file(fname_inp, fname_out, itype, verbose=False)
    return 0


def llama_eval(ctx, tokens, n_past: int | None = None, n_threads: int = 0) -> int:
    """llama_eval (llama.h:108-113). n_threads is accepted for signature
    parity and ignored (XLA owns device scheduling)."""
    eng = ctx.engine
    if n_past is not None and n_past != eng.n_past:
        if n_past == 0:
            eng.reset()
        elif n_past < eng.n_past:
            eng.n_past = n_past  # rewind: cache beyond n_past is stale-but-masked
            eng.tokens = eng.tokens[:n_past]
    ctx.logits = eng.eval(list(tokens), logits_all=ctx.params.logits_all)
    return 0


def llama_tokenize(ctx, text: bytes | str, add_bos: bool = False) -> list[int]:
    """llama_tokenize (llama.h:120-128)."""
    return ctx.tokenizer.encode(text, bos=add_bos)


def llama_n_vocab(ctx) -> int:  # llama.h:130
    return len(ctx.tokenizer.vocab)


def llama_n_ctx(ctx) -> int:  # llama.h:131
    return ctx.params.n_ctx


def llama_n_embd(ctx) -> int:  # llama.h:132
    return ctx.engine.cfg.n_embd


def llama_get_logits(ctx) -> np.ndarray:
    """llama_get_logits (llama.h:134-139): rows = n_tokens if logits_all else 1."""
    lg = ctx.logits
    return lg if lg.ndim == 2 else lg[None]


def llama_get_embeddings(ctx) -> np.ndarray:  # llama.h:141-144
    return ctx.engine.get_embeddings()


def llama_token_to_str(ctx, token: int) -> bytes:  # llama.h:146-147
    return ctx.tokenizer.decode_token(token)


def llama_token_bos() -> int:  # llama.h:149-151
    return 1


def llama_token_eos() -> int:
    return 2


def llama_sample_top_p_top_k(
    ctx,
    last_n_tokens: list[int],
    top_k: int,
    top_p: float,
    temp: float,
    repeat_penalty: float,
) -> int:
    """llama_sample_top_p_top_k (llama.h:153-161) over the last logits row."""
    eng = ctx.engine
    sp = SamplerParams(
        top_k=top_k,
        top_p=top_p,
        temp=temp,
        repeat_penalty=repeat_penalty,
        repeat_last_n=max(len(last_n_tokens), 1),
    )
    w = sp.repeat_last_n
    last = np.full(w, -1, np.int32)
    if last_n_tokens:
        last[-len(last_n_tokens):] = last_n_tokens[-w:]
    eng.key, sub = jax.random.split(eng.key)
    logits = llama_get_logits(ctx)[-1]
    return int(sample_token(jnp.asarray(logits), jnp.asarray(last), sub, sp))


# --- KV-cache snapshot (llama.h:91-106) -------------------------------------


def llama_get_kv_cache(ctx) -> bytes:
    s = ctx.engine.save_session()
    blob = s.k.tobytes() + s.v.tobytes()
    if s.k_scale is not None:  # int8 cache: scales ride behind the data
        blob += s.k_scale.tobytes() + s.v_scale.tobytes()
    if s.pos is not None:  # history ring: the position plane rides last
        blob += s.pos.tobytes()
    return blob


def llama_get_kv_cache_size(ctx) -> int:
    c = ctx.engine.cache
    n = c.k.nbytes + c.v.nbytes
    if c.quantized:
        n += c.k_scale.nbytes + c.v_scale.nbytes
    if c.ring:
        n += c.pos.nbytes
    return n


def llama_get_kv_cache_token_count(ctx) -> int:
    return ctx.engine.n_past


def llama_set_kv_cache(ctx, data: bytes, n_token_count: int) -> None:
    eng = ctx.engine
    c = eng.cache

    def take(tmpl):
        nonlocal data
        a = np.frombuffer(data[: tmpl.nbytes], np.asarray(tmpl).dtype)
        data = data[tmpl.nbytes :]
        return a.reshape(tmpl.shape)

    k, v = take(c.k), take(c.v)
    ks = vs = pos = None
    if c.quantized:
        ks, vs = take(c.k_scale), take(c.v_scale)
    if c.ring:
        pos = take(c.pos)
    eng.restore_session(
        SessionState(k=k, v=v, n_past=n_token_count,
                     tokens=eng.tokens[:n_token_count], k_scale=ks, v_scale=vs,
                     pos=pos)
    )


# --- timings / info ----------------------------------------------------------


def llama_print_timings(ctx) -> None:  # llama.h:164
    print(ctx.engine.timings.report())


def llama_reset_timings(ctx) -> None:  # llama.h:165
    from .runtime.engine import Timings

    ctx.engine.timings = Timings()


def llama_print_system_info() -> str:  # llama.h:168
    return system_info()


def llama_internal_get_tensor_map(ctx):
    """llama_internal_get_tensor_map (llama_internal.h:91-102 analog): the
    engine's parameter pytree for introspection tooling."""
    return ctx.engine.params
