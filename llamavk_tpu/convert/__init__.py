from .spm_reader import read_spm_vocab, write_spm_model
from .pth import convert_pth
from .hf import convert_hf
from .migrate import migrate_to_ggjt, ggml_to_pth
from .gptq import convert_gptq
