"""CLI tool tests on the tiny model: quantize, quantize-stats, perplexity,
generate, embedding."""

import io
import sys

import numpy as np
import pytest

from llamavk_tpu.formats import CheckpointReader
from llamavk_tpu.formats.q4 import GGML_FTYPE_Q4_0, GGML_FTYPE_Q4_1
from llamavk_tpu.models import load_model, random_tiny_model
from llamavk_tpu.cli.quantize import quantize_file
from llamavk_tpu.cli.quantize_stats import run_stats
from llamavk_tpu.cli.perplexity import perplexity


@pytest.fixture(scope="module")
def f32_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny-f32.bin")
    random_tiny_model(write_path=path, quantize=False)
    return path


def test_quantize_cli_roundtrip(f32_model, tmp_path):
    out = str(tmp_path / "tiny-q4_0.bin")
    quantize_file(f32_model, out, GGML_FTYPE_Q4_0, verbose=False)
    r = CheckpointReader(out)
    assert r.hparams.ftype == GGML_FTYPE_Q4_0
    t = r.tensors["layers.0.attention.wq.weight"]
    assert t.ftype == GGML_FTYPE_Q4_0
    # norms stay f32
    assert r.tensors["norm.weight"].ftype == 0
    # loadable and runnable
    cfg, params, tok = load_model(out)
    from llamavk_tpu.runtime import Engine, EngineConfig, SamplerParams

    e = Engine(cfg, params, EngineConfig(n_ctx=32))
    out_toks = e.generate([1, 2, 3], 4, SamplerParams(temp=0.0), ignore_eos=True)
    assert len(out_toks) == 4


def test_quantize_q4_1(f32_model, tmp_path):
    out = str(tmp_path / "tiny-q4_1.bin")
    quantize_file(f32_model, out, GGML_FTYPE_Q4_1, verbose=False)
    cfg, params, _ = load_model(out)
    from llamavk_tpu.models import init_kv_cache, llama_forward
    import jax.numpy as jnp

    cache = init_kv_cache(cfg, 1, 8)
    logits, _, _ = llama_forward(
        params, jnp.asarray([[1, 2]], jnp.int32), cache, jnp.int32(0), cfg
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_quantize_stats(f32_model, capsys):
    res = run_stats(f32_model, GGML_FTYPE_Q4_0, per_layer=False)
    tot = res["__total__"]
    assert 0 < tot["rmse"] < 0.02  # ~uniform quant error of 0.1-scale weights
    # device packed layout must round-trip identically to the codec
    res_dev = run_stats(f32_model, GGML_FTYPE_Q4_0, per_layer=False, device=True)
    assert res_dev["__total__"]["rmse"] == pytest.approx(tot["rmse"], abs=1e-7)
    # include/exclude are REGEX (searched, not globbed) like the reference's
    # layer_included (quantize-stats.cpp:70-80); exclude wins over include
    res_inc = run_stats(f32_model, GGML_FTYPE_Q4_0, include=[r"attention.*wq"])
    assert res_inc and all("wq" in k for k in res_inc if k != "__total__")
    res_exc = run_stats(
        f32_model, GGML_FTYPE_Q4_0,
        include=[r"attention"], exclude=[r"wq\.weight$"],
    )
    assert all("wq" not in k for k in res_exc)


def test_perplexity_runs(f32_model):
    cfg, params, tok = load_model(f32_model)
    # synthetic "text" long enough for 2 chunks of n_ctx=16: feed raw bytes
    text = bytes([65 + (i % 26) for i in range(2000)])
    ppl = perplexity(cfg, params, tok, text, n_ctx=16, max_chunks=2)
    assert np.isfinite(ppl) and ppl > 1.0


def test_generate_cli(f32_model, tmp_path, monkeypatch):
    from llamavk_tpu.cli.generate import build_argparser, run

    q4 = str(tmp_path / "q.bin")
    quantize_file(f32_model, q4, GGML_FTYPE_Q4_0, verbose=False)
    args = build_argparser().parse_args(
        ["-m", q4, "-p", "hello", "-n", "4", "--temp", "0", "-c", "64", "--ignore-eos"]
    )
    out = io.StringIO()
    rc = run(args, stdout=out)
    assert rc == 0


def test_embedding_cli(f32_model, capsys):
    from llamavk_tpu.cli.embedding import main

    rc = main(["-m", f32_model, "-p", "hi", "-c", "32"])
    assert rc == 0
    out = capsys.readouterr().out.strip().split()
    assert len(out) == 128  # n_embd of the tiny model


def test_generate_cli_mtest_color_random(f32_model, tmp_path):
    """--mtest probes memory and exits 0; --color wraps the prompt echo in
    ANSI yellow; --random-prompt picks a seeded starter when -p is empty."""
    from llamavk_tpu.cli.generate import ANSI_YELLOW, RANDOM_PROMPTS, build_argparser, run

    args = build_argparser().parse_args(
        ["-m", f32_model, "--mtest", "-n", "8", "-c", "32"]
    )
    assert run(args, stdout=io.StringIO()) == 0

    args = build_argparser().parse_args(
        ["-m", f32_model, "--random-prompt", "--color", "-s", "3", "-n", "2",
         "--temp", "0", "-c", "64", "--ignore-eos"]
    )
    out = io.StringIO()
    assert run(args, stdout=out) == 0
    text = out.getvalue()
    # prompt echo is wrapped in yellow (the tiny model's <tNN> vocab cannot
    # round-trip the starter words themselves, so assert the color framing)
    assert ANSI_YELLOW in text and "\x1b[0m" in text
    assert RANDOM_PROMPTS  # starter pool exists (seeded choice is host-side)


def test_generate_cli_sigint_interject(f32_model):
    """First ^C during interactive generation drops to the input prompt
    (main.cpp:26-36); a second ^C while waiting for input exits 130."""
    import signal

    from llamavk_tpu.cli.generate import build_argparser, run

    class InterruptingOut(io.StringIO):
        """Raises SIGINT in-process after the first generated token lands."""

        def __init__(self):
            super().__init__()
            self.fired = False

        def write(self, s):
            r = super().write(s)
            if not self.fired and s and not s.startswith("\x1b"):
                # fire once, mid-generation (handler runs synchronously)
                self.fired = True
                signal.raise_signal(signal.SIGINT)
            return r

    class OneLineStdin:
        def __init__(self):
            self.lines = ["more\n"]

        def readline(self):
            return self.lines.pop(0) if self.lines else ""

    args = build_argparser().parse_args(
        ["-m", f32_model, "-p", "hi", "-i", "-n", "6", "--temp", "0",
         "-c", "64", "--ignore-eos"]
    )
    out = InterruptingOut()
    rc = run(args, stdin=OneLineStdin(), stdout=out)
    assert rc == 0
    assert out.fired and "> " in out.getvalue()

    class SigintStdin:
        def readline(self):
            signal.raise_signal(signal.SIGINT)  # ^C while interacting
            return "never\n"

    args = build_argparser().parse_args(
        ["-m", f32_model, "-p", "hi", "-i", "-n", "2", "--temp", "0",
         "-c", "64", "--ignore-eos"]
    )
    with pytest.raises(SystemExit) as ei:
        run(args, stdin=SigintStdin(), stdout=io.StringIO())
    assert ei.value.code == 130


@pytest.mark.parametrize("argv,msg", [
    (["--dp", "2", "--max-batch", "9"], "divisible"),
    (["--dp", "2", "--paged"], "tp-only"),
    (["--shared-prefix", "--paged"], "exclusive"),
    (["--shared-prefix", "--dp", "2"], "not --dp"),
])
def test_serve_flag_validation(argv, msg, capsys):
    """Invalid serving flag combinations exit as argparse errors naming the
    flag, not engine-construction AssertionErrors (ADVICE r3)."""
    from llamavk_tpu.cli.serve import main as serve_main

    with pytest.raises(SystemExit) as ei:
        serve_main(["-m", "/nonexistent.bin", *argv])
    assert ei.value.code == 2
    assert msg in capsys.readouterr().err
