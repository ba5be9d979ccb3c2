"""llama.h compat-surface tests: the reference's C-API workflow end to end."""

import numpy as np
import pytest

from llamavk_tpu import compat as llama
from llamavk_tpu.models.loader import random_tiny_model


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.bin")
    random_tiny_model(write_path=path, quantize=True)
    return path


@pytest.fixture(scope="module")
def ctx(model_path):
    p = llama.llama_context_default_params()
    p.n_ctx = 64
    return llama.llama_init_from_file(model_path, p)


def test_reference_workflow(ctx):
    # the canonical llama.h usage loop: tokenize -> eval -> sample -> repeat
    ids = llama.llama_tokenize(ctx, "<t5><t6>", add_bos=True)
    assert ids[0] == llama.llama_token_bos()
    assert llama.llama_eval(ctx, ids) == 0
    logits = llama.llama_get_logits(ctx)
    assert logits.shape == (1, llama.llama_n_vocab(ctx))
    tok = llama.llama_sample_top_p_top_k(ctx, ids, 40, 0.95, 0.0, 1.1)
    assert 0 <= tok < llama.llama_n_vocab(ctx)
    # greedy sample must equal argmax when temp <= 0
    assert tok == int(np.argmax(logits[-1]))
    assert llama.llama_eval(ctx, [tok]) == 0


def test_dims_and_strings(ctx):
    assert llama.llama_n_ctx(ctx) == 64
    assert llama.llama_n_embd(ctx) == 128
    assert llama.llama_token_to_str(ctx, 7) == b"<t7>"
    assert llama.llama_token_eos() == 2
    assert "platform" in llama.llama_print_system_info()


def test_kv_cache_roundtrip(ctx):
    llama.llama_eval(ctx, [3, 4, 5], n_past=0)
    blob = llama.llama_get_kv_cache(ctx)
    assert len(blob) == llama.llama_get_kv_cache_size(ctx)
    count = llama.llama_get_kv_cache_token_count(ctx)
    logits_before = llama.llama_get_logits(ctx).copy()

    # perturb state, then restore
    llama.llama_eval(ctx, [9, 9, 9, 9])
    llama.llama_set_kv_cache(ctx, blob, count)
    assert llama.llama_get_kv_cache_token_count(ctx) == count
    # continuing from the restored state reproduces the original continuation
    llama.llama_eval(ctx, [7])
    a = llama.llama_get_logits(ctx).copy()
    llama.llama_set_kv_cache(ctx, blob, count)
    llama.llama_eval(ctx, [7])
    b = llama.llama_get_logits(ctx)
    np.testing.assert_array_equal(a, b)
    del logits_before


def test_embeddings_and_timings(ctx, capsys):
    llama.llama_eval(ctx, [1, 2, 3], n_past=0)
    emb = llama.llama_get_embeddings(ctx)
    assert emb.shape == (llama.llama_n_embd(ctx),)
    llama.llama_print_timings(ctx)
    assert "eval" in capsys.readouterr().out
    llama.llama_reset_timings(ctx)
    assert ctx.engine.timings.n_prompt == 0


def test_vocab_only_and_quantize(model_path, tmp_path):
    p = llama.llama_context_default_params()
    p.vocab_only = True
    vctx = llama.llama_init_from_file(model_path, p)
    assert vctx.engine is None
    # tiny-model vocab entries are unreachable by bigram merge (no
    # intermediate tokens), so encode uses byte fallback — the round trip is
    # the contract (llama.cpp:1233-1334 semantics)
    ids = llama.llama_tokenize(vctx, "<t9>", add_bos=False)
    assert ids == [b + 3 for b in b"<t9>"]  # byte-fallback id = byte + 3
    out = str(tmp_path / "q41.bin")
    assert llama.llama_model_quantize(model_path, out, 3) == 0
    import os

    assert os.path.getsize(out) > 0
