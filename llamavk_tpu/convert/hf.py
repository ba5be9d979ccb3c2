"""HuggingFace LLaMA checkpoint → GGJT v1 (new capability beyond the
reference's converters: modern checkpoints ship in HF format).

Handles the HF→Meta attention-weight unpermutation: HF stores wq/wk rows
reordered for the rotate-half RoPE convention; ggml/this framework use
adjacent-pair RoPE (ggml.c:7209-7224), so rows are regrouped back.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from ..formats.ggml_io import CheckpointWriter, Hparams
from ..formats.q4 import GGML_FTYPE_F16, GGML_FTYPE_F32
from .spm_reader import read_spm_vocab

# HF name → ggml name
def _map_name(name: str) -> str | None:
    if name == "model.embed_tokens.weight":
        return "tok_embeddings.weight"
    if name == "model.norm.weight":
        return "norm.weight"
    if name == "lm_head.weight":
        return "output.weight"
    if name.startswith("model.layers."):
        parts = name.split(".")
        i = parts[2]
        rest = ".".join(parts[3:])
        table = {
            "self_attn.q_proj.weight": "attention.wq.weight",
            "self_attn.k_proj.weight": "attention.wk.weight",
            "self_attn.v_proj.weight": "attention.wv.weight",
            "self_attn.o_proj.weight": "attention.wo.weight",
            "mlp.gate_proj.weight": "feed_forward.w1.weight",
            "mlp.down_proj.weight": "feed_forward.w2.weight",
            "mlp.up_proj.weight": "feed_forward.w3.weight",
            "input_layernorm.weight": "attention_norm.weight",
            "post_attention_layernorm.weight": "ffn_norm.weight",
        }
        if rest in table:
            return f"layers.{i}.{table[rest]}"
        return None
    if name.endswith("rotary_emb.inv_freq"):
        return None
    return None


def _unpermute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF rotate-half row order → Meta adjacent-pair row order.

    HF groups each head's rows as [even-halves | odd-halves]; Meta interleaves
    them pairwise."""
    dim = w.shape[0]
    dh = dim // n_head
    return (
        w.reshape(n_head, 2, dh // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def _load_hf_state(model_dir: str) -> dict[str, np.ndarray]:
    state: dict[str, np.ndarray] = {}
    st_files = sorted(f for f in os.listdir(model_dir) if f.endswith(".safetensors"))
    bin_files = sorted(
        f for f in os.listdir(model_dir)
        if f.startswith("pytorch_model") and f.endswith(".bin")
    )
    if st_files:
        from safetensors import safe_open

        for fn in st_files:
            with safe_open(os.path.join(model_dir, fn), framework="np") as f:
                for k in f.keys():
                    state[k] = np.asarray(f.get_tensor(k))
    elif bin_files:
        import torch

        for fn in bin_files:
            sd = torch.load(
                os.path.join(model_dir, fn), map_location="cpu", weights_only=True
            )
            for k, v in sd.items():
                state[k] = v.to(torch.float32).numpy()
    else:
        raise FileNotFoundError(f"no safetensors/bin weights in {model_dir}")
    return state


def convert_hf(model_dir: str, out_path: str | None = None, ftype: int = GGML_FTYPE_F16) -> str:
    with open(os.path.join(model_dir, "config.json")) as f:
        cj = json.load(f)
    vocab = read_spm_vocab(os.path.join(model_dir, "tokenizer.model"))
    n_head = cj["num_attention_heads"]
    hp = Hparams(
        n_vocab=len(vocab),
        n_embd=cj["hidden_size"],
        n_mult=256,
        n_head=n_head,
        n_layer=cj["num_hidden_layers"],
        n_rot=cj["hidden_size"] // n_head,
        ftype=ftype,
    )
    state = _load_hf_state(model_dir)
    if out_path is None:
        out_path = os.path.join(model_dir, "ggml-model-f16.bin")
    with CheckpointWriter(out_path, hp, vocab) as w:
        for hf_name, arr in state.items():
            name = _map_name(hf_name)
            if name is None:
                continue
            data = np.asarray(arr, np.float32)
            if ".wq." in name or ".wk." in name:
                data = _unpermute_qk(data, n_head)
            t = GGML_FTYPE_F32 if (ftype == GGML_FTYPE_F32 or data.ndim == 1) else GGML_FTYPE_F16
            dt = np.float16 if t == GGML_FTYPE_F16 else np.float32
            w.write_array(name, data.astype(dt), t)
            print(f"  {hf_name} -> {name} {data.shape}", file=sys.stderr)
    return out_path


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("--ftype", type=int, default=1)
    ap.add_argument("-o", "--out")
    args = ap.parse_args(argv)
    print(convert_hf(args.model_dir, args.out, args.ftype))
    return 0


if __name__ == "__main__":
    sys.exit(main())
