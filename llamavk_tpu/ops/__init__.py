from .qweight import QWeight, qweight_from_packed, dequantize_qweight
from .q4_matmul import q4_matmul, q4_matmul_ref, to_ilv
from .norms import rms_norm
from .rope import apply_rope, rope_cos_sin
