from .sampling import SamplerParams, sample_token, sample_logits_host
from .engine import Engine, EngineConfig, SessionState
