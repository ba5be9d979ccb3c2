"""Continuous batching scheduler — the serving layer.

New capability beyond the reference (its Vulkan path is strictly one stream,
`vulkan/llama-vk.cpp:2576-2635`): B request slots decode in lockstep as one
batched device program, requests join/leave between blocks, and the per-slot
position vector generalizes the reference's history-index indirection
(`vulkan/llama-vk.cpp:984-987`) — each slot owns a region of the KV slab
addressed by its own n_past.

Design: static shapes everywhere (XLA traces once). A decode block of
`block` steps runs fully on device via lax.scan (all slots advance
together; per-slot sampler params are vectors). Prefill runs per request
into a scratch B=1 cache and is inserted into the slot with one
dynamic_update_slice. Finished slots keep computing garbage until the block
ends — bounded waste that buys static shapes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..models.llama import (
    KVCache, LlamaParams, ModelConfig, init_kv_cache, init_paged_kv_cache,
    llama_forward,
)
from ..utils.jitopts import decode_jit
from .speculative import assemble_emitted, first_reject, lookup_draft_batched
from .sampling import SamplerParams, probs_batched_dyn, sample_tokens_batched

# shared-prefix pool [L, NP, H, Sp, D]: heads shard over tp (like the slot
# cache's head axis); the pool-entry dim NP is replicated
from jax.sharding import PartitionSpec as _PS

_POOL_PSPEC = _PS(None, None, "tp", None, None)


@dataclass
class Request:
    prompt: list[int]
    n_predict: int
    sp: SamplerParams = SamplerParams()
    seed: int = 0
    ignore_eos: bool = False
    prefix: int = -1  # id from register_prefix: prompt continues that prefix
    # filled by the scheduler:
    rid: int = -1
    slot: int = -1
    generated: list[int] = field(default_factory=list)
    done: bool = False
    on_token: Callable[[int], None] | None = None

    @property
    def output(self) -> list[int]:
        return self.generated


@dataclass(frozen=True)
class BatchConfig:
    max_batch: int = 8
    n_ctx: int = 512  # per-slot KV region length
    block: int = 8  # decode steps per device round-trip
    top_k: int = 64  # static sampler pool (max of per-request top_k)
    repeat_last_n: int = 64
    kv_dtype: str = "bfloat16"
    admit_chunk: int = 4  # max requests per batched admission prefill
    # (chunks are power-of-two sized: bounded set of compiled variants)
    shared_prefix: bool = False  # registered prefixes live in ONE shared
    # read-only pool the attention kernels pre-scan per row — slots hold only
    # suffix rows (no per-slot prefix copies at all; prefix KV memory is
    # O(pool) instead of O(batch)). The POOL is always bf16; the slot cache
    # may be bf16 or int8 (composition tested, r4), and tp composes (pool
    # heads shard). The general form of the reference's historyIndex
    # indirection (vulkan/llama-vk.cpp:984-987).
    prefix_pool: int = 4  # shared-prefix pool entries
    prefix_ctx: int = 256  # pool entry length (positions; multiple of 256)
    lookup_gamma: int = 0  # >0: prompt-lookup speculative decode. Each
    # round verifies up to lookup_gamma tokens drafted from the row's own
    # context at ~the cost of one plain step (runtime/speculative.py).
    # Greedy rows emit exactly the plain greedy stream; sampled rows are
    # exactly target-distributed (deterministic-proposal rejection, repeat
    # penalty folded in per verify position).
    paged: bool = False  # block-table paged KV (runtime/paged.py): K/V live
    # in a shared pool of `n_pages` pages of `page_size` rows; slots map
    # logical blocks through per-slot tables. KV memory = pages IN USE (not
    # max_batch x n_ctx), admission prefills straight into the slot's pages
    # (no scratch cache, no insert copies), prefix pages are shared
    # read-only across slots, and a full pool preempts the youngest request
    # (recompute on re-admission) instead of failing. bf16 or int8 KV
    # (int8 pages the per-row scale planes through the same tables;
    # page_size must then be a multiple of 32). Composes with lookup_gamma
    # (verify writes spill across page boundaries via the kernels'
    # page_straddle path, bf16 and int8). Excludes shared_prefix (the block
    # table IS the sharing mechanism).
    page_size: int = 128  # pool page rows (power of two; n_ctx % page_size
    # == 0). 128 is the measured sweet spot on the r5 mixed load (64 slots,
    # 128 requests, int8): 1622.7 tok/s vs 1339.7 at 64 and 1490.9 at 256 —
    # page rows set the flash kernels' KV block, and 64-row blocks double
    # the per-item work-list overhead while 256 over-reads short contexts
    # (round-up). Drop to 64 only when pool memory granularity matters more
    # than throughput.
    n_pages: int = 0  # pool pages; 0 -> max_batch * n_ctx / page_size + 1
    # (the flat footprint — size it SMALLER to oversubscribe slots, which is
    # the point: long-context slots and short ones share one budget)
    kv_block: int = 0  # cap the flash kernels' KV block (0 = fitted
    # default); pins the online-softmax accumulation order — a flat engine
    # at kv_block=c sums exactly like a paged engine with page_size=c, which
    # tests/test_paged.py uses for exact stream comparisons


class BatchedEngine:
    """Continuous-batching decode engine over one model replica — or, with
    `mesh`, over a tensor-parallel replica spanning the mesh's `tp` axis
    (Megatron split per parallel/sharding.py; collectives ride ICI inside
    the jitted decode blocks). Weights must then be loaded with the same
    `tp=` chunk packing (params_from_reader / synthetic_params) and are
    device_put with the split-table shardings here.

    A `dp` mesh axis shards the REQUEST SLOTS: each dp group of devices
    holds max_batch/dp slots' cache rows and decodes them in the same
    lockstep program (ONE dispatch serves every replica — data-parallel
    serving without per-replica dispatch overhead, which dominates on
    high-latency links). Admission prefills are computed replicated across
    dp groups; only the owning group merges the rows into its slot slice."""

    def __init__(self, cfg: ModelConfig, params: LlamaParams,
                 bcfg: BatchConfig = BatchConfig(), mesh=None):
        self.cfg = cfg
        self.bcfg = bcfg
        self.mesh = mesh
        tp_size = int(mesh.shape["tp"]) if mesh is not None else 1
        dp_size = int(mesh.shape.get("dp", 1)) if mesh is not None else 1
        if mesh is not None:
            from ..parallel.sharding import param_pspecs, shard_params

            assert int(mesh.shape.get("pp", 1)) == 1, (
                "BatchedEngine mesh: tp x dp only (no pp stages, v1)"
            )
            assert not (bcfg.shared_prefix and dp_size > 1), (
                "mesh serving: the shared-prefix pool composes with tp "
                "(pool heads shard), not dp (one pool, slot-sharded rows "
                "would each need their own replica)"
            )
            assert not (bcfg.paged and dp_size > 1), (
                "paged KV x mesh: tp only (the page pool is one shared "
                "allocator; dp would shard its page axis)"
            )
            assert cfg.n_head % tp_size == 0, (cfg.n_head, tp_size)
            assert bcfg.max_batch % dp_size == 0, (
                "dp serving shards request slots over the dp axis: "
                f"max_batch {bcfg.max_batch} % dp {dp_size} != 0"
            )
            params = shard_params(params, mesh)
        # int8 scale-plane lane pads: global caches give every tp shard its
        # own 128-aligned lane tile; scratch caches built INSIDE shard_map
        # bodies use the matching per-shard (local) pad
        from ..models.llama import scale_lane_pad

        self._hpad_global = scale_lane_pad(cfg.n_head, tp_size)
        hpad_local = self._hpad_global // tp_size
        self.params = params
        kv_step = 32 if jnp.dtype(bcfg.kv_dtype) == jnp.int8 else 8
        assert bcfg.n_ctx % kv_step == 0, (
            f"n_ctx must be a multiple of {kv_step} "
            f"({bcfg.kv_dtype} KV tile constraint); got {bcfg.n_ctx}"
        )
        b, w = bcfg.max_batch, bcfg.repeat_last_n
        if bcfg.paged:
            from .paged import PageAllocator, SlotPages

            ps = bcfg.page_size
            assert ps >= 8 and (ps & (ps - 1)) == 0, "page_size: power of two"
            assert bcfg.n_ctx % ps == 0, "n_ctx must be a multiple of page_size"
            kvd = jnp.dtype(bcfg.kv_dtype)
            assert kvd in (jnp.bfloat16, jnp.int8), (
                "paged KV: bf16 or int8 pools"
            )
            if kvd == jnp.int8:
                assert ps % 32 == 0, "int8 paged KV needs page_size % 32 == 0"
            assert not bcfg.shared_prefix, (
                "paged KV excludes shared_prefix (the block table IS the "
                "sharing mechanism)"
            )
            n_pages = bcfg.n_pages or (b * bcfg.n_ctx // ps + 1)
            self.cache = init_paged_kv_cache(
                cfg, n_pages, ps, dtype=kvd, h_pad=self._hpad_global
            )
            if mesh is not None:
                from ..parallel.sharding import shard_cache

                # pool dims [L, NP, H, PS, D] shard positionally like the
                # flat cache's [L, B, H, S, D]: heads on tp, NP replicated
                self.cache = shard_cache(self.cache, mesh)
            alloc = PageAllocator(n_pages)
            # page 0 is the TRASH page: freed slots keep decoding garbage
            # until the block ends, and their zeroed table rows must point
            # at memory no live request owns
            trash = alloc.alloc(1)
            assert trash == [0]
            self.pager = SlotPages(b, bcfg.n_ctx // ps, alloc)
            self._table_dev = jnp.asarray(self.pager.table)
            self.pager.dirty = False
        else:
            self.cache = init_kv_cache(
                cfg, b, bcfg.n_ctx, dtype=jnp.dtype(bcfg.kv_dtype),
                h_pad=self._hpad_global,
            )
            if mesh is not None:
                from ..parallel.sharding import shard_cache

                self.cache = shard_cache(self.cache, mesh)
        self.n_past = np.zeros(b, np.int32)
        self.cur_tok = np.zeros(b, np.int32)
        self.last_window = np.full((b, w), -1, np.int32)
        self.keys = jax.vmap(jax.random.key)(jnp.arange(b))
        self.top_p = np.ones(b, np.float32)
        self.temp = np.zeros(b, np.float32)
        self.penalty = np.ones(b, np.float32)
        self.slots: list[Request | None] = [None] * b
        self.queue: list[Request] = []
        self._rid = 0
        self.prefixes: dict[int, tuple] = {}  # id -> (cache1, length, tokens)
        self._pid = 0
        self.stats = {
            "tokens": 0, "steps": 0, "t_decode": 0.0, "prefills": 0,
            "prefill_calls": 0,
        }

        cfg_ = cfg
        # captured as a plain int: equal values keep the jit cache shared
        # across engine instances (see ops/flash_attn._ENV_BK note)
        kvb = bcfg.kv_block

        # tensor-parallel plumbing: the forward-running closures below route
        # through _fwd (adds tp_axis under a mesh) and, when a mesh is given,
        # wrap their bodies in shard_map with the split-table specs. Every
        # non-forward input/output is replicated (R): sampling runs
        # identically on every device over the all-gathered logits.
        tp_axis = "tp" if mesh is not None else None
        h_local = cfg.n_head // tp_size
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.sharding import cache_pspec, param_pspecs

            pspec_tree = param_pspecs(params)
            cspec_tree = cache_pspec(
                quantized=jnp.dtype(bcfg.kv_dtype) == jnp.int8
            )
            # prefix caches are single-row: batch dim replicated over dp
            cspec_pfx = cache_pspec(
                quantized=jnp.dtype(bcfg.kv_dtype) == jnp.int8,
                batch_axis=None,
            )
            R = P()
            # per-slot vectors/matrices shard their slot axis over dp (each
            # dp group decodes its own slice of the request slots; sampling
            # is row-wise, so per-shard sampling equals global sampling)
            D1 = P("dp")
            D2 = P("dp", None)

        def _shmap(body, in_specs, out_specs):
            return jax.shard_map(
                body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )

        def _fwd(p, tokens, cache, n_past, **kw):
            return llama_forward(
                p, tokens, cache, n_past, cfg_, kv_block=kvb,
                tp_axis=tp_axis, tp_size=tp_size, **kw
            )

        def _prefill_body(params, tokens, cacheN, n_past, last_idx):
            # batched admission prefill: N prompts (same bucket length) in one
            # program; per-row true final positions via vector last_idx.
            # n_past > 0 continues a seeded shared prefix (prefix caching).
            logits, cacheN, _ = _fwd(
                params, tokens, cacheN, n_past, last_idx=last_idx
            )
            return logits[:, 0, :], cacheN  # [N, V]

        if mesh is None:
            _prefill = decode_jit(_prefill_body)
            _prefill_pool = _prefill
        else:
            # _prefill only runs on single-row prefix caches (replicated
            # batch under dp; every dp group computes the same prefill)
            _prefill = decode_jit(_shmap(
                _prefill_body,
                in_specs=(pspec_tree, R, cspec_pfx, R, R),
                out_specs=(R, cspec_pfx),
            ))
            # pool registration prefills a bf16 single-row cache even when
            # the slot cache is int8 (the shared-prefix pool stays bf16)
            cspec_pool = cache_pspec(quantized=False, batch_axis=None)
            _prefill_pool = decode_jit(_shmap(
                _prefill_body,
                in_specs=(pspec_tree, R, cspec_pool, R, R),
                out_specs=(R, cspec_pool),
            ))

        def slice_cache(c, s_len):
            # first s_len POSITION rows of every cache plane (k/v keep S at
            # axis 3, int8 scale planes keep S at axis 2 — see init_kv_cache)
            return KVCache(
                k=c.k[:, :, :, :s_len],
                v=c.v[:, :, :, :s_len],
                k_scale=None if c.k_scale is None else c.k_scale[:, :, :s_len],
                v_scale=None if c.v_scale is None else c.v_scale[:, :, :s_len],
            )

        def seed_prefix(cacheP, n, s_len):
            # replicate the prefix cache's single batch row across an n-row
            # scratch cache, bounded to the s_len rows admission touches —
            # NOT the full n_ctx (admission cost must not scale with n_ctx)
            return jax.tree.map(
                lambda a: jnp.broadcast_to(
                    a, a.shape[:1] + (n,) + a.shape[2:]
                ).copy(),
                slice_cache(cacheP, s_len),
            )


        @partial(decode_jit, static_argnames=("n_steps", "top_k"), donate_argnums=(1, 3, 4))
        def _decode(params, cache, toks0, last, keys, n_past, top_p, temp, penalty,
                    n_steps, top_k):
            # PRNG keys cross the (optional) shard_map boundary as raw key
            # data — typed key arrays are not shard_map operands
            def body_all(params, cache, toks0, last, kd, n_past, top_p, temp,
                         penalty):
                keys = jax.random.wrap_key_data(kd)

                def body(state, _):
                    toks, cache, last, keys, n_past = state
                    logits, cache, _ = _fwd(params, toks[:, None], cache, n_past)
                    keys2 = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
                    subs = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
                    nxt = sample_tokens_batched(
                        logits[:, -1, :], last, subs, top_k, top_p, temp, penalty
                    )
                    last = jnp.roll(last, -1, axis=1).at[:, -1].set(nxt)
                    return (nxt, cache, last, keys2, n_past + 1), nxt

                state = (toks0, cache, last, keys, n_past)
                (toks, cache, last, keys, n_past), out = jax.lax.scan(
                    body, state, None, length=n_steps
                )
                return out.T, cache, last, jax.random.key_data(keys)

            kd = jax.random.key_data(keys)
            args = (params, cache, toks0, last, kd, n_past, top_p, temp, penalty)
            if mesh is None:
                out, cache, last, kd = body_all(*args)
            else:
                out, cache, last, kd = _shmap(
                    body_all,
                    in_specs=(pspec_tree, cspec_tree, D1, D2, D2, D1, D1, D1,
                              D1),
                    out_specs=(D2, cspec_tree, D2, D2),
                )(*args)
            return out, cache, last, jax.random.wrap_key_data(kd)

        @partial(decode_jit, static_argnames=("n_steps", "top_k"), donate_argnums=(1, 4, 5))
        def _decode_paged(params, cache, table, toks0, last, keys, n_past,
                          top_p, temp, penalty, n_steps, top_k):
            # plain decode block through the block table (the pool cache is
            # donated across blocks exactly like the flat slab; the table is
            # a tiny per-block operand — value changes never recompile).
            # Under a tp mesh the body runs per-shard (pool heads sharded,
            # table + per-slot vectors replicated).
            def body_all(params, cache, table, toks0, last, kd, n_past,
                         top_p, temp, penalty):
                keys = jax.random.wrap_key_data(kd)

                def body(state, _):
                    toks, cache, last, keys, n_past = state
                    logits, cache, _ = _fwd(
                        params, toks[:, None], cache, n_past, page_table=table
                    )
                    keys2 = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
                    subs = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
                    nxt = sample_tokens_batched(
                        logits[:, -1, :], last, subs, top_k, top_p, temp,
                        penalty,
                    )
                    last = jnp.roll(last, -1, axis=1).at[:, -1].set(nxt)
                    return (nxt, cache, last, keys2, n_past + 1), nxt

                state = (toks0, cache, last, keys, n_past)
                (toks, cache, last, keys, n_past), out = jax.lax.scan(
                    body, state, None, length=n_steps
                )
                return out.T, cache, last, jax.random.key_data(keys)

            kd = jax.random.key_data(keys)
            args = (params, cache, table, toks0, last, kd, n_past, top_p,
                    temp, penalty)
            if mesh is None:
                out, cache, last, kd = body_all(*args)
            else:
                out, cache, last, kd = _shmap(
                    body_all,
                    in_specs=(pspec_tree, cspec_tree, R, R, R, R, R, R, R, R),
                    out_specs=(R, cspec_tree, R, R),
                )(*args)
            return out, cache, last, jax.random.wrap_key_data(kd)

        @partial(decode_jit, static_argnames=("n", "top_k"), donate_argnums=(1,))
        def _admit_chunk_paged(params, cache, toks, n_past0, last_idx,
                               seeds, last_windows, top_p, temp, penalty,
                               table, n, top_k):
            # paged admission: prefill straight into the slots' own pages
            # through the chunk's table rows — NO scratch cache, NO per-row
            # insert copies (admission HBM traffic = the prompt KV itself).
            # n_past0 is page-aligned (prefix full pages; remainder tokens
            # ride prepended to the suffix), so every write block stays
            # within one page.
            def body_all(params, cache, toks, n_past0, last_idx, seeds,
                         last_windows, top_p, temp, penalty, table):
                npv = jnp.full((n,), n_past0, jnp.int32)
                logits, cache, _ = _fwd(
                    params, toks, cache, npv, last_idx=last_idx,
                    page_table=table,
                )
                subs = jax.vmap(jax.random.key)(seeds + 1)
                ids = sample_tokens_batched(
                    logits[:, 0, :], last_windows, subs, top_k, top_p, temp,
                    penalty,
                )
                return cache, ids

            args = (params, cache, toks, n_past0, last_idx, seeds,
                    last_windows, top_p, temp, penalty, table)
            if mesh is None:
                return body_all(*args)
            return _shmap(
                body_all,
                in_specs=(pspec_tree, cspec_tree, R, R, R, R, R, R, R, R, R),
                out_specs=(cspec_tree, R),
            )(*args)

        self._decode_paged = _decode_paged
        self._admit_chunk_paged = _admit_chunk_paged

        @partial(
            decode_jit, static_argnames=("n_steps", "gamma"), donate_argnums=(1, 3)
        )
        def _decode_lookup(params, cache, toks0, ctx, n_past, table, pk, pv,
                           pid, plen, n_steps, gamma):
            # batched prompt-lookup speculation (greedy): per row, draft the
            # continuation of the most recent (prev, tok) 2-gram occurrence
            # in that row's context, verify all gamma positions in one
            # multi-token forward (vector n_past), accept the agreeing
            # prefix. Matcher/assembly shared with runtime/speculative.py.
            # table != None: paged pool — the gamma-row verify write may
            # straddle a page boundary (page_straddle spills into the next
            # mapped page). pk != None: shared-prefix pool — n_past stays
            # LOGICAL; slots hold only suffix rows. Under a mesh the body
            # runs per-shard (matcher + argmax on replicated/all-gathered
            # values; dp shards the slot rows like _decode).
            def body_all(params, cache, toks0, ctx, n_past, table, pk, pv,
                         pid, plen):
                pfx_kw = (
                    dict(prefix_kv=(pk, pv), prefix_id=pid, prefix_len=plen)
                    if pk is not None else {}
                )

                def body(state, _):
                    toks, cache, ctx, n_past = state
                    seq, draft, p = lookup_draft_batched(
                        ctx, toks, n_past, gamma
                    )
                    logits, cache, _ = _fwd(
                        params, seq, cache, n_past,
                        logits_all=True, page_table=table,
                        page_straddle=table is not None, **pfx_kw,
                    )
                    y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, g]
                    k = first_reject(draft == y[:, : gamma - 1])
                    corr = jnp.take_along_axis(
                        y, jnp.minimum(k, gamma - 1)[:, None], 1
                    )[:, 0]
                    emitted, count = assemble_emitted(k, draft, corr, gamma)
                    ctx = jax.vmap(
                        lambda c, s, np_: jax.lax.dynamic_update_slice(
                            c, s, (np_,)
                        )
                    )(ctx, seq, n_past)
                    return (corr, cache, ctx, n_past + count), (emitted, count)

                state = (toks0, cache, ctx, n_past)
                (toks, cache, ctx, n_past), (em, cnt) = jax.lax.scan(
                    body, state, None, length=n_steps
                )
                return em, cnt, toks, cache, ctx, n_past

            args = (params, cache, toks0, ctx, n_past, table, pk, pv, pid,
                    plen)
            if mesh is None:
                return body_all(*args)
            tspec = None if table is None else R
            pfspec = None if pk is None else _POOL_PSPEC
            pidspec = None if pk is None else R
            return _shmap(
                body_all,
                in_specs=(pspec_tree, cspec_tree, D1, D2, D1, tspec,
                          pfspec, pfspec, pidspec, pidspec),
                out_specs=(P(None, "dp", None), P(None, "dp"), D1,
                           cspec_tree, D2, D1),
            )(*args)

        @partial(
            decode_jit,
            static_argnames=("n_steps", "gamma", "top_k"),
            donate_argnums=(1, 3),
        )
        def _decode_lookup_sampled(params, cache, toks0, ctx, last, keys,
                                   n_past, top_p, temp, penalty, table,
                                   pk, pv, pid, plen, n_steps, gamma, top_k):
            # sampled lookup speculation, mixed greedy/sampled rows: the
            # deterministic draft d is accepted with prob p_t(d) (greedy rows
            # see a point-mass p_t, so accept == argmax-agreement), rejection
            # resamples from p_t with d zeroed — exactly target-distributed.
            # The repeat-penalty window for position i depends only on the
            # KNOWN consumed inputs seq[:, :i+1], so penalty folds in
            # per-position with static window shifts.
            w = last.shape[1]

            def body_all(params, cache, toks0, ctx, last, kd, n_past, top_p,
                         temp, penalty, table, pk, pv, pid, plen):
              keys0 = jax.random.wrap_key_data(kd)
              nb = toks0.shape[0]
              pfx_kw = (
                  dict(prefix_kv=(pk, pv), prefix_id=pid, prefix_len=plen)
                  if pk is not None else {}
              )

              def body(state, _):
                toks, cache, ctx, last, keys, n_past = state
                seq, draft, p = lookup_draft_batched(ctx, toks, n_past, gamma)
                logits, cache, _ = _fwd(
                    params, seq, cache, n_past,
                    logits_all=True, page_table=table,
                    page_straddle=table is not None, **pfx_kw,
                )
                pts = []
                for i in range(gamma):
                    win_i = (
                        jnp.concatenate([last, seq[:, 1 : i + 1]], axis=1)[:, -w:]
                        if i > 0 else last
                    )
                    pts.append(
                        probs_batched_dyn(
                            logits[:, i], win_i, top_k, top_p, temp, penalty
                        )
                    )
                pt_all = jnp.stack(pts, axis=1)  # [B, gamma, V]

                ks = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
                keys2, ku, kc = ks[:, 0], ks[:, 1], ks[:, 2]
                us = jax.vmap(
                    lambda k: jax.random.uniform(k, (max(gamma - 1, 1),))
                )(ku)[:, : gamma - 1]
                safe = jnp.maximum(draft, 0)
                pt_draft = jnp.take_along_axis(
                    pt_all[:, : gamma - 1], safe[:, :, None], axis=2
                )[..., 0]
                acc = (us < pt_draft) & (draft >= 0)
                k = first_reject(acc)
                pt_k = jnp.take_along_axis(
                    pt_all, k[:, None, None], axis=1
                )[:, 0]  # [B, V]
                safe_pad = jnp.concatenate(
                    [safe, jnp.zeros((nb, 1), jnp.int32)], axis=1
                )
                rej = jnp.take_along_axis(
                    safe_pad, jnp.minimum(k, gamma - 1)[:, None], axis=1
                )[:, 0]
                drop = (k < gamma - 1) & (p >= 0)
                vmask = (
                    jnp.arange(pt_k.shape[1])[None] == rej[:, None]
                ) & drop[:, None]
                resid = jnp.where(vmask, 0.0, pt_k)
                resid = resid / jnp.maximum(
                    resid.sum(axis=1, keepdims=True), 1e-30
                )
                corr = jax.vmap(
                    lambda kk, r: jax.random.categorical(kk, jnp.log(r + 1e-30))
                )(kc, resid).astype(jnp.int32)
                emitted, count = assemble_emitted(k, draft, corr, gamma)
                ctx = jax.vmap(
                    lambda c, s, np_: jax.lax.dynamic_update_slice(c, s, (np_,))
                )(ctx, seq, n_past)
                last = jax.vmap(
                    lambda l, e, c: jax.lax.dynamic_slice(
                        jnp.concatenate([l, e]), (c,), (w,)
                    )
                )(last, emitted, count)
                return (
                    (corr, cache, ctx, last, keys2, n_past + count),
                    (emitted, count),
                )

              state = (toks0, cache, ctx, last, keys0, n_past)
              (toks, cache, ctx, last, keys, n_past), (em, cnt) = jax.lax.scan(
                  body, state, None, length=n_steps
              )
              return (em, cnt, toks, cache, ctx, last,
                      jax.random.key_data(keys), n_past)

            kd = jax.random.key_data(keys)
            args = (params, cache, toks0, ctx, last, kd, n_past, top_p, temp,
                    penalty, table, pk, pv, pid, plen)
            if mesh is None:
                out = body_all(*args)
            else:
                tspec = None if table is None else R
                pfspec = None if pk is None else _POOL_PSPEC
                pidspec = None if pk is None else R
                out = _shmap(
                    body_all,
                    in_specs=(pspec_tree, cspec_tree, D1, D2, D2, D2, D1, D1,
                              D1, D1, tspec, pfspec, pfspec, pidspec,
                              pidspec),
                    out_specs=(P(None, "dp", None), P(None, "dp"), D1,
                               cspec_tree, D2, D2, D2, D1),
                )(*args)
            em, cnt, toks, cache, ctx, last, kd, n_past = out
            return (em, cnt, toks, cache, ctx, last,
                    jax.random.wrap_key_data(kd), n_past)

        self._decode_lookup_sampled = _decode_lookup_sampled

        @decode_jit
        def _ctx_write(ctx, rows, slots):
            # ONE dispatch seeds every admitted row (ctx is small, so the
            # scatter is cheap — unlike the multi-GB cache, where per-row
            # dynamic_update_slice wins; see models/llama.py vector_past)
            return ctx.at[slots].set(rows)

        @partial(decode_jit, static_argnames=("n",))
        def _admit_merge(cur, last, rows, ids, n):
            # scatter one admission chunk's DEVICE-side first tokens into
            # the decode block's cur_tok/last_window operands — the block
            # dispatches against these futures and the ids sync happens
            # after it is in flight (_finish_admits), so the device never
            # waits for a host round-trip between prefill and decode
            lw = jnp.roll(last[rows], -1, axis=1).at[:, -1].set(ids)
            return cur.at[rows].set(ids), last.at[rows].set(lw)

        self._decode_lookup = _decode_lookup
        self._ctx_write = _ctx_write
        self._admit_merge = _admit_merge
        self._pending_admits: list[tuple] = []
        if bcfg.lookup_gamma > 0:
            # lookup context rows are LOGICAL tokens; with a shared prefix
            # the logical span is prefix + suffix, beyond the (suffix-only)
            # slot n_ctx
            self._ctx_len = bcfg.n_ctx + (
                bcfg.prefix_ctx if bcfg.shared_prefix else 0
            )
            self.ctx_dev = jnp.zeros((b, self._ctx_len), jnp.int32)

        if bcfg.shared_prefix:
            # the POOL is always bf16 — one pool copy serves every batch
            # row, so full precision costs O(pool) not O(batch); the SLOT
            # cache may be bf16 or int8 (the kernels' pre-pass streams the
            # pool through its own bf16 buffers — ops/flash_attn.py)
            assert bcfg.prefix_ctx % 256 == 0
            pool_shape = (
                cfg.n_layer, bcfg.prefix_pool, cfg.n_head, bcfg.prefix_ctx,
                cfg.head_dim,
            )
            self.pfx_k = jnp.zeros(pool_shape, jnp.bfloat16)
            self.pfx_v = jnp.zeros(pool_shape, jnp.bfloat16)
            if mesh is not None:
                from jax.sharding import NamedSharding

                # pool heads shard over tp like the slot cache's head axis
                pool_sh = NamedSharding(mesh, _POOL_PSPEC)
                self.pfx_k = jax.device_put(self.pfx_k, pool_sh)
                self.pfx_v = jax.device_put(self.pfx_v, pool_sh)
            self.pfx_len = np.zeros(b, np.int32)
            self.pfx_id = np.zeros(b, np.int32)

        @partial(
            decode_jit, static_argnames=("n_steps", "top_k"),
            donate_argnums=(1, 3, 4),
        )
        def _decode_shared(params, cache, toks0, last, keys, n_past, top_p,
                           temp, penalty, pk, pv, pid, plen, n_steps, top_k):
            # plain decode block over [shared prefix | slot suffix] attention;
            # n_past is LOGICAL (llama_forward uses n_past - plen for the
            # slot rows and full positions for RoPE). Under a tp mesh the
            # body runs per-shard: pool heads sharded, everything else
            # replicated (dp is excluded with shared_prefix).
            def body_all(params, cache, toks0, last, kd, n_past, top_p, temp,
                         penalty, pk, pv, pid, plen):
                keys = jax.random.wrap_key_data(kd)

                def body(state, _):
                    toks, cache, last, keys, n_past = state
                    logits, cache, _ = _fwd(
                        params, toks[:, None], cache, n_past,
                        prefix_kv=(pk, pv), prefix_id=pid, prefix_len=plen,
                    )
                    keys2 = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
                    subs = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
                    nxt = sample_tokens_batched(
                        logits[:, -1, :], last, subs, top_k, top_p, temp,
                        penalty,
                    )
                    last = jnp.roll(last, -1, axis=1).at[:, -1].set(nxt)
                    return (nxt, cache, last, keys2, n_past + 1), nxt

                state = (toks0, cache, last, keys, n_past)
                (toks, cache, last, keys, n_past), out = jax.lax.scan(
                    body, state, None, length=n_steps
                )
                return out.T, cache, last, jax.random.key_data(keys)

            kd = jax.random.key_data(keys)
            args = (params, cache, toks0, last, kd, n_past, top_p, temp,
                    penalty, pk, pv, pid, plen)
            if mesh is None:
                out, cache, last, kd = body_all(*args)
            else:
                out, cache, last, kd = _shmap(
                    body_all,
                    in_specs=(pspec_tree, cspec_tree, R, R, R, R, R, R, R,
                              _POOL_PSPEC, _POOL_PSPEC, R, R),
                    out_specs=(R, cspec_tree, R, R),
                )(*args)
            return out, cache, last, jax.random.wrap_key_data(kd)

        @partial(
            decode_jit, static_argnames=("n", "top_k", "scratch_len"),
            donate_argnums=(1,),
        )
        def _admit_chunk_shared(params, cache, toks, pfx_len_s, last_idx,
                                slots, seeds, last_windows, top_p, temp,
                                penalty, pk, pv, pid_s, n, top_k, scratch_len):
            # suffix-only admission: the scratch cache covers JUST the suffix
            # bucket; the prefix is attended straight from the shared pool —
            # admission does no prefix copying at all
            def body_all(params, cache, toks, pfx_len_s, last_idx, slots,
                         seeds, last_windows, top_p, temp, penalty, pk, pv,
                         pid_s):
                # the scratch cache matches the SLOT cache's dtype/lane pads
                # (bf16 or int8; under a mesh the body sees the local head
                # shard); the pool stays bf16 either way
                cacheN = init_kv_cache(
                    cfg_, n, scratch_len, dtype=jnp.dtype(bcfg.kv_dtype),
                    n_head_local=h_local, h_pad=hpad_local,
                )
                npv = jnp.full((n,), pfx_len_s, jnp.int32)
                logits, cacheN, _ = _fwd(
                    params, toks, cacheN, npv, last_idx=last_idx,
                    prefix_kv=(pk, pv),
                    prefix_id=jnp.full((n,), pid_s, jnp.int32),
                    prefix_len=npv,
                )
                logits = logits[:, 0, :]

                def ins(c, cN, row, slot):
                    r = jax.lax.dynamic_slice_in_dim(cN, row, 1, axis=1)
                    return jax.lax.dynamic_update_slice(
                        c, r,
                        (jnp.int32(0), slot) + (jnp.int32(0),) * (c.ndim - 2),
                    )

                for j in range(n):
                    cache = jax.tree.map(
                        lambda c, cN: ins(c, cN, jnp.int32(j), slots[j]),
                        cache, cacheN,
                    )
                subs = jax.vmap(jax.random.key)(seeds + 1)
                ids = sample_tokens_batched(
                    logits, last_windows, subs, top_k, top_p, temp, penalty
                )
                return cache, ids

            args = (params, cache, toks, pfx_len_s, last_idx, slots, seeds,
                    last_windows, top_p, temp, penalty, pk, pv, pid_s)
            if mesh is None:
                return body_all(*args)
            return _shmap(
                body_all,
                in_specs=(pspec_tree, cspec_tree, R, R, R, R, R, R, R, R, R,
                          _POOL_PSPEC, _POOL_PSPEC, R),
                out_specs=(cspec_tree, R),
            )(*args)

        @decode_jit
        def _pool_write(pk, pv, ck, cv, pid):
            zero = (jnp.int32(0),)
            at = (jnp.int32(0), pid) + (jnp.int32(0),) * 3
            return (
                jax.lax.dynamic_update_slice(pk, ck, at),
                jax.lax.dynamic_update_slice(pv, cv, at),
            )

        self._decode_shared = _decode_shared
        self._admit_chunk_shared = _admit_chunk_shared
        self._pool_write = _pool_write

        bcfg_ = self.bcfg

        @partial(
            decode_jit,
            static_argnames=("n", "top_k", "prefixed", "scratch_len"),
            donate_argnums=(1,),
        )
        def _admit_chunk(params, cache, pfx_cache, toks, n_past0, last_idx,
                         slots, seeds, last_windows, top_p, temp, penalty,
                         n, top_k, prefixed, scratch_len):
            # ONE device program per admission chunk: scratch-cache seeding,
            # suffix prefill, per-row slot inserts, and the batched
            # first-token sample. The axon tunnel charges ~25-30 ms of host
            # time PER DISPATCH, so fusing the 4-7 separate admission
            # dispatches into one is what keeps admission off the serving
            # critical path (measured: non-decode wall dominated by
            # dispatch count, not device compute).
            #
            # scratch_len bounds EVERY admission copy (seed, prefill cache,
            # slot insert) to the position rows the chunk actually touches —
            # pow2(prefix + prompt bucket), NOT n_ctx. Rows past scratch_len
            # in the slot keep the previous occupant's stale K/V, which is
            # sound: reads are masked to positions < n_past, and decode
            # overwrites row n_past before attending to it.
            def body_all(params, cache, pfx_cache, toks, n_past0, last_idx,
                         slots, seeds, last_windows, top_p, temp, penalty):
                if prefixed:
                    cacheN = seed_prefix(pfx_cache, n, scratch_len)
                else:
                    # under a mesh the body sees the LOCAL head shard (and
                    # the matching per-shard scale-plane lane pad)
                    cacheN = init_kv_cache(
                        cfg_, n, scratch_len, dtype=jnp.dtype(bcfg_.kv_dtype),
                        n_head_local=h_local, h_pad=hpad_local,
                    )
                logits, cacheN, _ = _fwd(
                    params, toks, cacheN, n_past0, last_idx=last_idx
                )
                logits = logits[:, 0, :]  # [n, V]

                def ins(c, cN, row, slot):
                    # under dp the cache batch dim is the LOCAL slot slice:
                    # localize the global slot index; non-owning dp groups
                    # rewrite the (clamped) row unchanged
                    r = jax.lax.dynamic_slice_in_dim(cN, row, 1, axis=1)
                    if mesh is not None and dp_size > 1:
                        bl = c.shape[1]
                        loc = slot - jax.lax.axis_index("dp") * bl
                        owns = (loc >= 0) & (loc < bl)
                        slot_l = jnp.clip(loc, 0, bl - 1)
                        start = (jnp.int32(0), slot_l) + (
                            jnp.int32(0),
                        ) * (c.ndim - 2)
                        cur = jax.lax.dynamic_slice(c, start, r.shape)
                        r = jnp.where(owns, r, cur)
                    else:
                        start = (jnp.int32(0), slot) + (
                            jnp.int32(0),
                        ) * (c.ndim - 2)
                    return jax.lax.dynamic_update_slice(c, r, start)

                for j in range(n):
                    cache2 = jax.tree.map(
                        lambda c, cN: ins(c, cN, jnp.int32(j), slots[j]),
                        cache, cacheN,
                    )
                    cache = cache2
                subs = jax.vmap(jax.random.key)(seeds + 1)
                ids = sample_tokens_batched(
                    logits, last_windows, subs, top_k, top_p, temp, penalty
                )
                return cache, ids

            args = (params, cache, pfx_cache, toks, n_past0, last_idx, slots,
                    seeds, last_windows, top_p, temp, penalty)
            if mesh is None:
                return body_all(*args)
            return _shmap(
                body_all,
                in_specs=(pspec_tree, cspec_tree,
                          cspec_pfx if prefixed else None,
                          R, R, R, R, R, R, R, R, R),
                out_specs=(cspec_tree, R),
            )(*args)

        @partial(decode_jit, donate_argnums=(1,))
        def _prefill_paged(params, cache, toks, n_past0, table):
            def body_all(params, cache, toks, n_past0, table):
                _, cache, _ = _fwd(
                    params, toks, cache, n_past0, page_table=table
                )
                return cache

            args = (params, cache, toks, n_past0, table)
            if mesh is None:
                return body_all(*args)
            return _shmap(
                body_all,
                in_specs=(pspec_tree, cspec_tree, R, R, R),
                out_specs=cspec_tree,
            )(*args)

        self._prefill_paged = _prefill_paged
        self._prefill = _prefill
        self._prefill_pool = _prefill_pool
        self._admit_chunk = _admit_chunk
        self._decode = _decode

    # --- public API -------------------------------------------------------

    def register_prefix(self, tokens: list[int]) -> int:
        """Prefill a shared prompt prefix (e.g. a system prompt) ONCE and
        return its id. Requests submitted with prefix=id prefill only their
        suffix: the prefix K/V rows are copied into the slot at admission —
        prefix caching, new capability beyond the reference (whose engine
        re-evaluates every stream's full prompt)."""
        if self.bcfg.paged:
            # the prefix's FULL pages are shared read-only across slots by
            # table aliasing (refcounted); the sub-page remainder tokens ride
            # prepended to each request's suffix (at most page_size - 1
            # re-evaluated tokens), which keeps every admission write
            # page-aligned
            ps = self.bcfg.page_size
            plen = len(tokens)
            assert 0 < plen < self.bcfg.n_ctx, "prefix length out of range"
            full = plen // ps
            pages = self.pager.alloc.alloc(full) if full else []
            if full:
                table = np.zeros((1, self.bcfg.n_ctx // ps), np.int32)
                table[0, :full] = pages
                tdev = jnp.asarray(table)
                # decompose the page-aligned body into decreasing power-of-
                # two chunks: each chunk's start is a multiple of its length
                # (binary carry structure), so writes stay page-aligned
                start = 0
                body = np.asarray(tokens[: full * ps], np.int32)
                while start < full * ps:
                    c = 1 << ((full * ps - start).bit_length() - 1)
                    self.cache = self._prefill_paged(
                        self.params, self.cache,
                        jnp.asarray(body[None, start : start + c]),
                        jnp.int32(start), tdev,
                    )
                    start += c
            pid = self._pid
            self._pid += 1
            self.prefixes[pid] = (pages, plen, list(tokens))
            return pid
        if self.bcfg.shared_prefix:
            plen = len(tokens)
            assert 0 < plen <= self.bcfg.prefix_ctx, "prefix exceeds pool ctx"
            pid = self._pid
            assert pid < self.bcfg.prefix_pool, "prefix pool full"
            self._pid += 1
            bucket = 8
            while bucket < plen:
                bucket *= 2
            bucket = min(bucket, self.bcfg.prefix_ctx)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, :plen] = tokens
            cache1 = init_kv_cache(self.cfg, 1, self.bcfg.prefix_ctx)
            if self.mesh is not None:
                from ..parallel.sharding import shard_cache

                cache1 = shard_cache(cache1, self.mesh, batch_axis=None)
            _, cache1 = self._prefill_pool(
                self.params, jnp.asarray(padded), cache1, jnp.int32(0),
                jnp.asarray([plen - 1], np.int32),
            )
            self.pfx_k, self.pfx_v = self._pool_write(
                self.pfx_k, self.pfx_v, cache1.k, cache1.v, jnp.int32(pid)
            )
            self.prefixes[pid] = (None, plen, list(tokens))
            return pid
        assert 0 < len(tokens) < self.bcfg.n_ctx, "prefix length out of range"
        plen = len(tokens)
        bucket = 8
        while bucket < plen:
            bucket *= 2
        bucket = min(bucket, self.bcfg.n_ctx)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :plen] = tokens
        cache1 = init_kv_cache(
            self.cfg, 1, self.bcfg.n_ctx, dtype=jnp.dtype(self.bcfg.kv_dtype),
            h_pad=self._hpad_global,
        )
        if self.mesh is not None:
            from ..parallel.sharding import shard_cache

            # single-row prefix cache: batch dim replicated over dp
            cache1 = shard_cache(cache1, self.mesh, batch_axis=None)
        _, cache1 = self._prefill(
            self.params, jnp.asarray(padded), cache1, jnp.int32(0),
            jnp.asarray([plen - 1], np.int32),
        )
        pid = self._pid
        self._pid += 1
        self.prefixes[pid] = (cache1, plen, list(tokens))
        return pid

    def submit(self, prompt: list[int], n_predict: int,
               sp: SamplerParams = SamplerParams(), seed: int = 0,
               ignore_eos: bool = False,
               on_token: Callable[[int], None] | None = None,
               prefix: int = -1) -> Request:
        total = len(prompt) + (self.prefixes[prefix][1] if prefix >= 0 else 0)
        if self.bcfg.shared_prefix:
            # slots hold only the suffix; the prefix lives in the pool
            total = len(prompt)
        g = self.bcfg.lookup_gamma
        if g > 0:
            # the per-round gamma-window writes need gamma-1 rows of slack
            assert total + n_predict + g - 1 <= self.bcfg.n_ctx, (
                "request exceeds n_ctx (lookup needs gamma-1 rows of slack)"
            )
        else:
            assert total + n_predict <= self.bcfg.n_ctx, "request exceeds n_ctx"
        assert len(prompt) >= 1, "prompt suffix must be non-empty"
        req = Request(prompt=list(prompt), n_predict=n_predict, sp=sp, seed=seed,
                      ignore_eos=ignore_eos, rid=self._rid, on_token=on_token,
                      prefix=prefix)
        self._rid += 1
        self.queue.append(req)
        return req

    def _paged_admit_info(self, req: Request):
        """(shared pages, page-aligned prefix rows, suffix tokens, bucket).

        The prefix's sub-page remainder rides prepended to the suffix (so
        admission writes start page-aligned); a preempted request's generated
        tokens re-enter the same way (recompute-on-readmission)."""
        ps = self.bcfg.page_size
        if req.prefix >= 0:
            pages, _plen, ptoks = self.prefixes[req.prefix]
            aligned = len(pages) * ps
            suffix = ptoks[aligned:] + req.prompt + req.generated
        else:
            pages, aligned = [], 0
            suffix = req.prompt + req.generated
        bucket = 8
        while bucket < len(suffix):
            bucket *= 2
        bucket = min(bucket, self.bcfg.n_ctx - aligned)
        return pages, aligned, suffix, bucket

    def _admit_paged(self) -> None:
        """Paged admission: reserve pages (prefix pages shared by table
        aliasing), then prefill each chunk STRAIGHT into its slots' pages —
        no scratch cache, no insert copies. A dry pool defers admission
        until decode frees pages."""
        ps = self.bcfg.page_size
        free = [s for s in range(self.bcfg.max_batch) if self.slots[s] is None]
        admitted, infos = [], {}
        while free and self.queue:
            req = self.queue[0]
            info = self._paged_admit_info(req)
            pages, aligned, suffix, bucket = info
            slot = free[0]
            try:
                if pages:
                    self.pager.share(slot, pages)
                self.pager.ensure(slot, aligned + bucket, ps)
            except MemoryError:
                self.pager.free_slot(slot)
                break  # pool full: keep queueing; decode frees pages
            free.pop(0)
            self.queue.pop(0)
            req.slot = slot
            self.slots[slot] = req
            admitted.append(req)
            infos[req.rid] = info
        if not admitted:
            return

        w = self.bcfg.repeat_last_n
        groups: dict[tuple, list[Request]] = {}
        for req in admitted:
            groups.setdefault((infos[req.rid][3], req.prefix), []).append(req)
        pending = []
        for (bucket, pfx), items in groups.items():
            pfx_tokens = self.prefixes[pfx][2] if pfx >= 0 else []
            aligned = infos[items[0].rid][1]
            i = 0
            while i < len(items):
                n = 1 << max(0, (len(items) - i).bit_length() - 1)
                n = min(n, max(1, self.bcfg.admit_chunk))
                chunk = items[i : i + n]
                i += n
                toks = np.zeros((n, bucket), np.int32)
                last_idx = np.zeros(n, np.int32)
                seeds = np.zeros(n, np.int64)
                table = np.zeros((n, self.pager.table.shape[1]), np.int32)
                for j, req in enumerate(chunk):
                    suffix = infos[req.rid][2]
                    toks[j, : len(suffix)] = suffix
                    last_idx[j] = len(suffix) - 1
                    seeds[j] = req.seed
                    slot = req.slot
                    table[j] = self.pager.table[slot]
                    hist = (pfx_tokens + req.prompt + req.generated)[-w:]
                    self.last_window[slot] = -1
                    if hist:
                        self.last_window[slot, -len(hist):] = hist
                    self.top_p[slot] = req.sp.top_p
                    self.temp[slot] = req.sp.temp
                    self.penalty[slot] = req.sp.repeat_penalty
                    self.n_past[slot] = aligned + len(suffix)
                rows = np.asarray([r.slot for r in chunk])
                # ONE batched key write per chunk (per-request .at[].set
                # was one tiny dispatch per admitted request)
                self.keys = self.keys.at[jnp.asarray(rows.astype(np.int32))].set(
                    jax.vmap(jax.random.key)(jnp.asarray(seeds))
                )
                self.cache, ids = self._admit_chunk_paged(
                    self.params,
                    self.cache,
                    jnp.asarray(toks),
                    jnp.int32(aligned),
                    jnp.asarray(last_idx),
                    jnp.asarray(seeds.astype(np.int32)),
                    jnp.asarray(self.last_window[rows]),
                    jnp.asarray(self.top_p[rows]),
                    jnp.asarray(self.temp[rows]),
                    jnp.asarray(self.penalty[rows]),
                    jnp.asarray(table),
                    n=n,
                    top_k=self.bcfg.top_k,
                )
                self.stats["prefills"] += n
                self.stats["prefill_calls"] += 1
                pending.append((chunk, ids))

        # first-token syncs are DEFERRED: step() merges the device-side ids
        # into the decode block's operands (_admit_merge) and only syncs
        # them once the block is dispatched (_finish_admits)
        self._pending_admits.extend(pending)

        if self.bcfg.lookup_gamma > 0:
            # seed the device-side lookup context rows — LOGICAL tokens at
            # logical positions (prefix + prompt + any recompute-on-
            # readmission generated tokens); one dispatch per wave
            rows = np.zeros((len(admitted), self._ctx_len), np.int32)
            slots_a = np.zeros(len(admitted), np.int32)
            for j, req in enumerate(admitted):
                pfx_tokens = (
                    self.prefixes[req.prefix][2] if req.prefix >= 0 else []
                )
                # consumed INPUTS only: the admission prefill consumed
                # generated (recompute-on-readmission; the first sampled
                # token is still unsynced in _pending_admits and feeds the
                # next round as cur_tok, so it is NOT part of the context)
                hist = (
                    pfx_tokens + req.prompt + req.generated
                )[: self._ctx_len]
                rows[j, : len(hist)] = hist
                slots_a[j] = req.slot
            self.ctx_dev = self._ctx_write(
                self.ctx_dev, jnp.asarray(rows), jnp.asarray(slots_a)
            )

    def _admit(self) -> None:
        """Fill free slots from the queue, batching prefills.

        Admissions group by prompt bucket length and run in power-of-two-sized
        chunks (bounded compiled variants, capped by bcfg.admit_chunk): one
        batched prefill + one batched first-token sample per chunk, per-row
        cache inserts dispatched asynchronously. Phase 1 gets every chunk's
        device work in flight; phase 2 syncs the sampled ids chunk by chunk —
        the (high-latency, ~30 ms) device round-trips all overlap."""
        if self.bcfg.paged:
            return self._admit_paged()
        free = [s for s in range(self.bcfg.max_batch) if self.slots[s] is None]
        admitted = []
        while free and self.queue:
            req = self.queue.pop(0)
            req.slot = free.pop(0)
            self.slots[req.slot] = req
            admitted.append(req)
        if not admitted:
            return

        def bucket_of(plen: int) -> int:
            b = 8
            while b < plen:
                b *= 2
            return min(b, self.bcfg.n_ctx)

        groups: dict[tuple, list[Request]] = {}
        for req in admitted:
            groups.setdefault(
                (bucket_of(len(req.prompt)), req.prefix), []
            ).append(req)

        w = self.bcfg.repeat_last_n
        pending = []  # (chunk requests, device ids [n])
        shared = self.bcfg.shared_prefix
        for (bucket, pfx), items in groups.items():
            pfx_cache, pfx_len, pfx_tokens = (
                self.prefixes[pfx] if pfx >= 0 else (None, 0, [])
            )
            # suffix writes live at [pfx_len, pfx_len + bucket): clamp the
            # padding so they cannot run past the slot region (shared mode:
            # slots hold ONLY the suffix, so the whole region is available)
            bucket = min(bucket, self.bcfg.n_ctx - (0 if shared else pfx_len))
            # admission touches rows [0, pfx_len + bucket) — shared mode just
            # [0, bucket); bound every copy to the next power of two of that
            # (64 floor keeps the flash kernel's K-block divisibility),
            # independent of n_ctx
            need = bucket if shared else pfx_len + bucket
            scratch_len = 64
            while scratch_len < need:
                scratch_len *= 2
            scratch_len = min(scratch_len, self.bcfg.n_ctx)
            i = 0
            while i < len(items):
                n = 1 << max(0, (len(items) - i).bit_length() - 1)
                n = min(n, max(1, self.bcfg.admit_chunk))
                chunk = items[i : i + n]
                i += n
                toks = np.zeros((n, bucket), np.int32)
                last_idx = np.zeros(n, np.int32)
                seeds = np.zeros(n, np.int64)
                for j, req in enumerate(chunk):
                    plen = len(req.prompt)
                    toks[j, :plen] = req.prompt
                    last_idx[j] = plen - 1
                    seeds[j] = req.seed
                    slot = req.slot
                    hist = (pfx_tokens + req.prompt)[-w:]
                    self.last_window[slot] = -1
                    if hist:
                        self.last_window[slot, -len(hist):] = hist
                    self.top_p[slot] = req.sp.top_p
                    self.temp[slot] = req.sp.temp
                    self.penalty[slot] = req.sp.repeat_penalty
                    self.n_past[slot] = pfx_len + plen
                # ONE fused dispatch per chunk: seed/zero the scratch
                # cache, prefill the (suffix) prompts, insert each row into
                # its slot, sample the first tokens
                rows = np.asarray([r.slot for r in chunk])
                # ONE batched key write per chunk (not one per request)
                self.keys = self.keys.at[jnp.asarray(rows.astype(np.int32))].set(
                    jax.vmap(jax.random.key)(jnp.asarray(seeds))
                )
                if shared:
                    for req in chunk:
                        self.pfx_len[req.slot] = pfx_len
                        self.pfx_id[req.slot] = max(pfx, 0)
                    self.cache, ids = self._admit_chunk_shared(
                        self.params,
                        self.cache,
                        jnp.asarray(toks),
                        jnp.int32(pfx_len),
                        jnp.asarray(last_idx),
                        jnp.asarray(rows.astype(np.int32)),
                        jnp.asarray(seeds.astype(np.int32)),
                        jnp.asarray(self.last_window[rows]),
                        jnp.asarray(self.top_p[rows]),
                        jnp.asarray(self.temp[rows]),
                        jnp.asarray(self.penalty[rows]),
                        self.pfx_k,
                        self.pfx_v,
                        jnp.int32(max(pfx, 0)),
                        n=n,
                        top_k=self.bcfg.top_k,
                        scratch_len=scratch_len,
                    )
                    self.stats["prefills"] += n
                    self.stats["prefill_calls"] = (
                        self.stats.get("prefill_calls", 0) + 1
                    )
                    pending.append((chunk, ids))
                    continue
                self.cache, ids = self._admit_chunk(
                    self.params,
                    self.cache,
                    pfx_cache if pfx >= 0 else None,
                    jnp.asarray(toks),
                    jnp.int32(pfx_len),
                    jnp.asarray(last_idx),
                    jnp.asarray(rows.astype(np.int32)),
                    jnp.asarray(seeds.astype(np.int32)),
                    jnp.asarray(self.last_window[rows]),
                    jnp.asarray(self.top_p[rows]),
                    jnp.asarray(self.temp[rows]),
                    jnp.asarray(self.penalty[rows]),
                    n=n,
                    top_k=self.bcfg.top_k,
                    prefixed=pfx >= 0,
                    scratch_len=scratch_len,
                )
                self.stats["prefills"] += n
                self.stats["prefill_calls"] = self.stats.get("prefill_calls", 0) + 1
                pending.append((chunk, ids))

        # first-token syncs are DEFERRED (see _admit_paged / _finish_admits)
        self._pending_admits.extend(pending)

        if self.bcfg.lookup_gamma > 0:
            # seed the device-side context rows the lookup matcher reads —
            # ONE dispatch for the whole admission wave
            rows = np.zeros((len(admitted), self._ctx_len), np.int32)
            slots = np.zeros(len(admitted), np.int32)
            for j, req in enumerate(admitted):
                pfx_tokens = self.prefixes[req.prefix][2] if req.prefix >= 0 else []
                hist = (pfx_tokens + req.prompt)[: self._ctx_len]
                rows[j, : len(hist)] = hist
                slots[j] = req.slot
            self.ctx_dev = self._ctx_write(
                self.ctx_dev, jnp.asarray(rows), jnp.asarray(slots)
            )

    def _finish_admits(self) -> None:
        """Sync the deferred admission first tokens (emitting them to
        streams) and mirror the device-side cur_tok/last_window updates into
        the host arrays. Called AFTER the decode block is dispatched — the
        ids finished on device before the block even started, so this wait
        overlaps the block instead of stalling the device."""
        pending, self._pending_admits = self._pending_admits, []
        for chunk, ids in pending:
            ids = np.asarray(ids)
            for j, req in enumerate(chunk):
                tok = int(ids[j])
                slot = req.slot
                self._emit(req, tok)
                self.cur_tok[slot] = tok
                self.last_window[slot] = np.roll(self.last_window[slot], -1)
                self.last_window[slot, -1] = tok

    def _block_inputs(self):
        """(cur_tok, last_window) decode-block operands: the host arrays
        with any pending admission chunks' device-side first tokens
        scattered in (no sync — the ids stay futures)."""
        cur = jnp.asarray(self.cur_tok)
        last = jnp.asarray(self.last_window)
        for chunk, ids in self._pending_admits:
            rows = jnp.asarray(np.asarray([r.slot for r in chunk], np.int32))
            cur, last = self._admit_merge(cur, last, rows, ids, n=len(chunk))
        return cur, last

    def _emit(self, req: Request, tok: int) -> None:
        req.generated.append(tok)
        if req.on_token is not None:
            req.on_token(tok)
        if len(req.generated) >= req.n_predict or (
            not req.ignore_eos and tok == 2
        ):
            req.done = True

    def step(self) -> list[Request]:
        """Admit queued requests, run one decode block, return finished ones.

        Admission prefill dispatches and the decode block dispatch are
        pipelined: the block's operands take the admission chunks' sampled
        first tokens as DEVICE futures (_block_inputs), and the first-token
        sync (_finish_admits) runs only after the block is in flight — the
        device executes prefills and the block back-to-back with no host
        round-trip between them."""
        self._admit()
        active = [s for s in self.slots if s is not None]
        if not active:
            self._finish_admits()  # defensive; admits imply active slots
            return []
        # n_steps is a STATIC arg of the jitted decode block: every distinct
        # value compiles a fresh program (~40 s on a 7B), so never derive it
        # from per-request budgets — run power-of-two blocks (at most
        # log2(block)+1 compiled variants, from the context-room clamp) and
        # discard per-request overshoot below. A request that finishes
        # mid-block frees its slot; its extra KV writes sit beyond the slot's
        # n_past and are never attended.
        shared = self.bcfg.shared_prefix
        local = self.n_past - self.pfx_len if shared else self.n_past
        room = self.bcfg.n_ctx - 1 - int(local.max())
        g = self.bcfg.lookup_gamma
        if g > 0:
            return self._step_lookup(room, g)
        if self.bcfg.paged:
            return self._step_paged(room)
        n_steps = min(self.bcfg.block, max(1, room))
        n_steps = 1 << (n_steps.bit_length() - 1)  # snap down to a power of 2
        t0 = time.perf_counter()
        cur, lastw = self._block_inputs()
        if shared:
            toks, self.cache, last, self.keys = self._decode_shared(
                self.params,
                self.cache,
                cur,
                lastw,
                self.keys,
                jnp.asarray(self.n_past),
                jnp.asarray(self.top_p),
                jnp.asarray(self.temp),
                jnp.asarray(self.penalty),
                self.pfx_k,
                self.pfx_v,
                jnp.asarray(self.pfx_id),
                jnp.asarray(self.pfx_len),
                n_steps,
                self.bcfg.top_k,
            )
        else:
            toks, self.cache, last, self.keys = self._decode(
                self.params,
                self.cache,
                cur,
                lastw,
                self.keys,
                jnp.asarray(self.n_past),
                jnp.asarray(self.top_p),
                jnp.asarray(self.temp),
                jnp.asarray(self.penalty),
                n_steps,
                self.bcfg.top_k,
            )
        self._finish_admits()  # overlaps the decode block on device
        toks = np.asarray(toks)  # [B, n_steps]
        self.last_window = np.array(last)  # writable host copy
        self.stats["t_decode"] += time.perf_counter() - t0
        self.stats["steps"] += n_steps

        finished = []
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            consumed = 0
            for t in toks[slot]:
                consumed += 1
                if req.done:
                    break
                self._emit(req, int(t))
                self.stats["tokens"] += 1
                if req.done:
                    break
            self.n_past[slot] += consumed
            self.cur_tok[slot] = toks[slot][consumed - 1]
            if req.done:
                finished.append(req)
                self.slots[slot] = None
                self.n_past[slot] = 0
                if self.bcfg.shared_prefix:
                    self.pfx_len[slot] = 0
                    self.pfx_id[slot] = 0
        return finished

    def _preempt(self, slot: int) -> None:
        """Release `slot`'s pages and return its request to the queue head.
        Its generated tokens re-enter the admission prefill as prompt suffix
        (recompute-on-readmission — the vLLM-style fallback when the pool
        runs dry; emitted tokens are never rolled back)."""
        req = self.slots[slot]
        self.slots[slot] = None
        self.pager.free_slot(slot)
        self.n_past[slot] = 0
        req.slot = -1
        self.queue.insert(0, req)
        self.stats["preempted"] = self.stats.get("preempted", 0) + 1

    def _ensure_block_pages(self, rows_per_step: int, n_steps: int) -> None:
        """Map every live slot's write pages for the coming block up front,
        preempting the youngest request when the pool runs dry; sync the
        device table if it changed."""
        ps = self.bcfg.page_size
        for slot in range(self.bcfg.max_batch):
            if self.slots[slot] is None:
                continue
            while self.slots[slot] is not None:
                try:
                    self.pager.ensure(
                        slot,
                        min(self.bcfg.n_ctx,
                            int(self.n_past[slot]) + n_steps * rows_per_step),
                        ps,
                    )
                    break
                except MemoryError:
                    victims = [
                        s for s in range(self.bcfg.max_batch)
                        if self.slots[s] is not None
                    ]
                    if victims == [slot]:
                        raise MemoryError(
                            "KV page pool too small for one request; "
                            "increase BatchConfig.n_pages"
                        ) from None
                    victim = max(victims, key=lambda s: self.slots[s].rid)
                    self._preempt(victim)
                    # if `slot` itself was youngest it skips its ensure; its
                    # zeroed table row points at the trash page until
                    # re-admission
        if self.pager.dirty:
            self._table_dev = jnp.asarray(self.pager.table)
            self.pager.dirty = False

    def _step_paged(self, room: int) -> list[Request]:
        """One paged decode block: map this block's write pages up front
        (preempting the youngest request when the pool runs dry), sync the
        block table to device if it changed, decode through the table."""
        n_steps = min(self.bcfg.block, max(1, room))
        n_steps = 1 << (n_steps.bit_length() - 1)
        self._ensure_block_pages(1, n_steps)

        t0 = time.perf_counter()
        cur, lastw = self._block_inputs()
        toks, self.cache, last, self.keys = self._decode_paged(
            self.params,
            self.cache,
            self._table_dev,
            cur,
            lastw,
            self.keys,
            jnp.asarray(self.n_past),
            jnp.asarray(self.top_p),
            jnp.asarray(self.temp),
            jnp.asarray(self.penalty),
            n_steps,
            self.bcfg.top_k,
        )
        self._finish_admits()  # overlaps the decode block on device
        toks = np.asarray(toks)
        self.last_window = np.array(last)
        self.stats["t_decode"] += time.perf_counter() - t0
        self.stats["steps"] += n_steps

        finished = []
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            consumed = 0
            for t in toks[slot]:
                consumed += 1
                if req.done:
                    break
                self._emit(req, int(t))
                self.stats["tokens"] += 1
                if req.done:
                    break
            self.n_past[slot] += consumed
            self.cur_tok[slot] = toks[slot][consumed - 1]
            if req.done:
                finished.append(req)
                self.slots[slot] = None
                self.n_past[slot] = 0
                self.pager.free_slot(slot)
        return finished

    def _step_lookup(self, room: int, g: int) -> list[Request]:
        """One lookup-speculative decode block: n_steps rounds, each emitting
        1..g tokens per row. The submit-time slack guarantee keeps every
        round's g-row write window inside the slot region. Paged mode maps
        up to n_steps*g rows of pages per slot up front (preempt-youngest on
        a dry pool) and verify writes spill across page boundaries through
        the kernel's page_straddle path."""
        n_steps = min(self.bcfg.block, max(1, room // g))
        n_steps = 1 << (n_steps.bit_length() - 1)
        table = None
        if self.bcfg.paged:
            self._ensure_block_pages(g, n_steps)
            table = self._table_dev
        if self.bcfg.shared_prefix:
            pk, pv = self.pfx_k, self.pfx_v
            pid = jnp.asarray(self.pfx_id)
            plen = jnp.asarray(self.pfx_len)
        else:
            pk = pv = pid = plen = None
        sampled = any(
            req is not None and req.sp.temp > 0 for req in self.slots
        )
        t0 = time.perf_counter()
        cur, lastw = self._block_inputs()
        if sampled:
            (em, cnt, toks, self.cache, self.ctx_dev, last, self.keys,
             npast_dev) = self._decode_lookup_sampled(
                self.params,
                self.cache,
                cur,
                self.ctx_dev,
                lastw,
                self.keys,
                jnp.asarray(self.n_past),
                jnp.asarray(self.top_p),
                jnp.asarray(self.temp),
                jnp.asarray(self.penalty),
                table,
                pk, pv, pid, plen,
                n_steps,
                g,
                self.bcfg.top_k,
            )
        else:
            em, cnt, toks, self.cache, self.ctx_dev, npast_dev = (
                self._decode_lookup(
                    self.params,
                    self.cache,
                    cur,
                    self.ctx_dev,
                    jnp.asarray(self.n_past),
                    table,
                    pk, pv, pid, plen,
                    n_steps,
                    g,
                )
            )
        self._finish_admits()  # overlaps the decode rounds on device
        if sampled:
            # sync AFTER _finish_admits (np.array forces a device sync; the
            # block output windows already include the admitted rows)
            self.last_window = np.array(last)
        em = np.asarray(em)  # [n_steps, B, g]
        cnt = np.asarray(cnt)  # [n_steps, B]
        toks_h = np.asarray(toks)
        npast_h = np.asarray(npast_dev)
        self.stats["t_decode"] += time.perf_counter() - t0
        self.stats["steps"] += n_steps

        finished = []
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            for i in range(n_steps):
                if req.done:
                    break  # junk rounds past `done` count toward nothing
                c = int(cnt[i, slot])
                self.stats["rounds"] = self.stats.get("rounds", 0) + 1
                self.stats["accepted"] = self.stats.get("accepted", 0) + (c - 1)
                for t in em[i, slot, :c]:
                    if req.done:
                        break
                    self._emit(req, int(t))
                    self.stats["tokens"] += 1
            # the device consumed ALL n_steps rounds; mirror its n_past and
            # pending token exactly (junk rounds past `done` only wrote rows
            # the next occupant's admission will overwrite)
            self.n_past[slot] = npast_h[slot]
            self.cur_tok[slot] = toks_h[slot]
            if req.done:
                finished.append(req)
                self.slots[slot] = None
                self.n_past[slot] = 0
                if self.bcfg.paged:
                    self.pager.free_slot(slot)
                if self.bcfg.shared_prefix:
                    self.pfx_len[slot] = 0
                    self.pfx_id[slot] = 0
        return finished

    def run(self) -> list[Request]:
        """Drain the queue; returns all finished requests."""
        done: list[Request] = []
        while self.queue or any(self.slots):
            done.extend(self.step())
        return done
