from .llama import (
    ModelConfig,
    LayerParams,
    FusedLayerParams,
    LlamaParams,
    QEmbedding,
    embed_tokens,
    llama_forward,
    init_kv_cache,
    init_paged_kv_cache,
    KVCache,
)
from .loader import (
    load_model,
    params_from_reader,
    params_to_i4,
    random_tiny_model,
    random_ref_model,
    synthetic_params,
    LLAMA_CONFIGS,
)
