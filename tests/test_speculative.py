"""Speculative decoding: greedy equivalence with the target-only stream —
regardless of the draft model — plus acceptance accounting."""

import numpy as np
import pytest

from llamavk_tpu.models import load_model, random_tiny_model
from llamavk_tpu.runtime import Engine, EngineConfig, SamplerParams
from llamavk_tpu.runtime.speculative import SpecConfig, SpeculativeEngine

GREEDY = SamplerParams(temp=0.0)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("m")
    tp = str(d / "target.bin")
    dp = str(d / "draft.bin")
    random_tiny_model(write_path=tp, quantize=True, seed=0)
    # unrelated draft: different weights AND a smaller network
    random_tiny_model(write_path=dp, quantize=True, seed=7, n_layer=1, n_ff=128)
    cfg_t, params_t, _ = load_model(tp)
    cfg_d, params_d, _ = load_model(dp)
    return cfg_t, params_t, cfg_d, params_d


def test_spec_equals_target_greedy_unrelated_draft(models):
    cfg_t, params_t, cfg_d, params_d = models
    want = Engine(cfg_t, params_t, EngineConfig(n_ctx=64)).generate(
        [5, 9, 2, 30], 12, GREEDY, ignore_eos=True
    )
    spec = SpeculativeEngine(
        cfg_t, params_t, cfg_d, params_d,
        SpecConfig(n_ctx=64, gamma=3, rounds_per_block=4),
    )
    got = spec.generate([5, 9, 2, 30], 12, ignore_eos=True)
    assert got == want
    assert spec.stats["rounds"] > 0


def test_spec_self_draft_accepts_everything(models):
    """Drafting with the target itself must accept every proposal."""
    cfg_t, params_t, _, _ = models
    spec = SpeculativeEngine(
        cfg_t, params_t, cfg_t, params_t,
        SpecConfig(n_ctx=64, gamma=4, rounds_per_block=2),
    )
    want = Engine(cfg_t, params_t, EngineConfig(n_ctx=64)).generate(
        [7, 3, 11], 10, GREEDY, ignore_eos=True
    )
    got = spec.generate([7, 3, 11], 10, ignore_eos=True)
    assert got == want
    assert spec.acceptance_rate == 1.0


def test_spec_gamma_one_degenerates(models):
    cfg_t, params_t, cfg_d, params_d = models
    spec = SpeculativeEngine(
        cfg_t, params_t, cfg_d, params_d,
        SpecConfig(n_ctx=64, gamma=1, rounds_per_block=4),
    )
    want = Engine(cfg_t, params_t, EngineConfig(n_ctx=64)).generate(
        [4, 8, 15], 8, GREEDY, ignore_eos=True
    )
    assert spec.generate([4, 8, 15], 8, ignore_eos=True) == want


def test_spec_sampled_self_draft_high_acceptance(models):
    """Same model + same sampler params => p_draft == p_target (up to matmul
    rounding), so almost every proposal is accepted and output is seeded-
    deterministic."""
    cfg_t, params_t, _, _ = models
    sp = SamplerParams(temp=0.8, top_k=40, top_p=0.95, repeat_penalty=1.0)
    spec = SpeculativeEngine(
        cfg_t, params_t, cfg_t, params_t,
        SpecConfig(n_ctx=64, gamma=3, rounds_per_block=3),
    )
    out1 = spec.generate([5, 9, 2], 10, ignore_eos=True, sp=sp, seed=3)
    assert len(out1) == 10
    assert spec.acceptance_rate > 0.9
    out2 = spec.generate([5, 9, 2], 10, ignore_eos=True, sp=sp, seed=3)
    assert out1 == out2  # deterministic per seed (engine auto-resets)
    out3 = spec.generate([5, 9, 2], 10, ignore_eos=True, sp=sp, seed=4)
    assert out3 != out1  # and actually stochastic across seeds


def test_spec_sampled_unrelated_draft_runs(models):
    cfg_t, params_t, cfg_d, params_d = models
    sp = SamplerParams(temp=1.0, top_k=0, top_p=1.0, repeat_penalty=1.0)
    spec = SpeculativeEngine(
        cfg_t, params_t, cfg_d, params_d,
        SpecConfig(n_ctx=64, gamma=2, rounds_per_block=4),
    )
    out = spec.generate([7, 3], 12, ignore_eos=True, sp=sp, seed=0)
    assert len(out) == 12 and all(0 <= t < cfg_t.n_vocab for t in out)


def test_spec_rejection_scheme_is_unbiased():
    """NumPy twin of the round's accept/residual math: the first emitted
    token must be distributed exactly as p_target, whatever the draft."""
    rng = np.random.default_rng(0)
    V = 16
    pt = rng.dirichlet(np.ones(V) * 0.5)
    pd = rng.dirichlet(np.ones(V) * 0.5)
    N = 200_000
    d = rng.choice(V, N, p=pd)
    u = rng.uniform(size=N)
    ratio = pt[d] / np.maximum(pd[d], 1e-30)
    accept = u < np.minimum(ratio, 1.0)
    resid = np.maximum(pt - pd, 0.0)
    resid = resid / resid.sum()
    emitted = np.where(accept, d, rng.choice(V, N, p=resid))
    emp = np.bincount(emitted, minlength=V) / N
    assert np.abs(emp - pt).sum() < 0.01  # total variation ~ noise floor


# --- prompt-lookup (draft-model-free) speculation ---------------------------

def _lookup_twin(prompt, plain_out, gamma, rounds_per_block, n_predict):
    """NumPy twin of LookupEngine's round loop: greedy equivalence means
    every on-path verify output equals the plain greedy stream, so per-round
    acceptance counts are predictable from the stream + the match rule."""
    S = list(prompt) + list(plain_out)  # S[p] = token consumed at position p
    plen = len(prompt)
    n_past = plen
    out = [plain_out[0]]
    rounds = accepted = 0
    while len(out) < n_predict:
        for _ in range(rounds_per_block):
            tok = S[n_past]
            prev = S[n_past - 1]
            p = -1
            for q in range(1, n_past - gamma + 1):
                if S[q] == tok and S[q - 1] == prev:
                    p = q
            draft = S[p + 1 : p + gamma] if p >= 0 else [-1] * (gamma - 1)
            k = gamma - 1
            for j in range(gamma - 1):
                if draft[j] != S[n_past + j + 1]:
                    k = j
                    break
            count = k + 1
            rounds += 1
            accepted += count - 1
            stop = False
            for j in range(count):
                out.append(S[n_past + j + 1])
                if len(out) >= n_predict:
                    stop = True
                    break
            n_past += count
            if stop:
                break
        if len(out) >= n_predict:
            break
    return out[:n_predict], rounds, accepted


def test_lookup_equals_plain_greedy(models):
    from llamavk_tpu.runtime.speculative import LookupEngine

    cfg_t, params_t, _, _ = models
    # repetitive prompt: gives the 2-gram matcher something to find
    prompt = [5, 9, 2, 30, 5, 9, 2, 30, 5, 9]
    want = Engine(cfg_t, params_t, EngineConfig(n_ctx=128)).generate(
        prompt, 20, GREEDY, ignore_eos=True
    )
    eng = LookupEngine(
        cfg_t, params_t, SpecConfig(n_ctx=128, gamma=4, rounds_per_block=4)
    )
    got = eng.generate(prompt, 20, ignore_eos=True)
    assert got == want
    # the twin predicts the exact acceptance accounting
    _, rounds, accepted = _lookup_twin(prompt, want, 4, 4, 20)
    assert eng.stats["rounds"] == rounds
    assert eng.stats["accepted"] == accepted


def test_lookup_equals_plain_greedy_generic_prompt(models):
    from llamavk_tpu.runtime.speculative import LookupEngine

    cfg_t, params_t, _, _ = models
    prompt = [7, 3, 11]
    want = Engine(cfg_t, params_t, EngineConfig(n_ctx=128)).generate(
        prompt, 16, GREEDY, ignore_eos=True
    )
    eng = LookupEngine(
        cfg_t, params_t, SpecConfig(n_ctx=128, gamma=3, rounds_per_block=4)
    )
    got = eng.generate(prompt, 16, ignore_eos=True)
    assert got == want
    _, rounds, accepted = _lookup_twin(prompt, want, 3, 4, 16)
    assert eng.stats["rounds"] == rounds
    assert eng.stats["accepted"] == accepted


def test_lookup_gamma_one_degenerates(models):
    from llamavk_tpu.runtime.speculative import LookupEngine

    cfg_t, params_t, _, _ = models
    want = Engine(cfg_t, params_t, EngineConfig(n_ctx=64)).generate(
        [4, 8, 15], 8, GREEDY, ignore_eos=True
    )
    eng = LookupEngine(
        cfg_t, params_t, SpecConfig(n_ctx=64, gamma=1, rounds_per_block=4)
    )
    assert eng.generate([4, 8, 15], 8, ignore_eos=True) == want


def test_lookup_sampling_is_unbiased():
    """NumPy twin of the deterministic-proposal rejection scheme: accept the
    draft d with prob p_t(d), else sample from p_t with d zeroed out — the
    emitted token must be distributed exactly as p_t."""
    rng = np.random.default_rng(0)
    V = 16
    pt = rng.dirichlet(np.ones(V) * 0.5)
    d = 3  # deterministic draft token
    N = 200_000
    u = rng.uniform(size=N)
    accept = u < pt[d]
    resid = pt.copy()
    resid[d] = 0.0
    resid = resid / resid.sum()
    emitted = np.where(accept, d, rng.choice(V, N, p=resid))
    emp = np.bincount(emitted, minlength=V) / N
    assert np.abs(emp - pt).sum() < 0.01


def test_lookup_sampled_runs_and_is_seeded(models):
    from llamavk_tpu.runtime.speculative import LookupEngine

    cfg_t, params_t, _, _ = models
    sp = SamplerParams(temp=0.9, top_k=40, top_p=0.95, repeat_penalty=1.0)
    eng = LookupEngine(
        cfg_t, params_t, SpecConfig(n_ctx=128, gamma=3, rounds_per_block=4)
    )
    out1 = eng.generate([5, 9, 2, 30, 5, 9, 2, 30], 12, ignore_eos=True,
                        sp=sp, seed=7)
    out2 = eng.generate([5, 9, 2, 30, 5, 9, 2, 30], 12, ignore_eos=True,
                        sp=sp, seed=7)
    assert out1 == out2  # seeded-deterministic
    assert len(out1) == 12 and all(0 <= t < cfg_t.n_vocab for t in out1)
    out3 = eng.generate([5, 9, 2, 30, 5, 9, 2, 30], 12, ignore_eos=True,
                        sp=sp, seed=8)
    assert out3 != out1  # different seed, different stream (overwhelmingly)
