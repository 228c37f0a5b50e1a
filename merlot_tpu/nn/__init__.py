from merlot_tpu.nn.layers import DenseTN, LayerNorm, GroupNorm, WSConv  # noqa: F401
from merlot_tpu.nn.transformer import TransformerEncoder  # noqa: F401
from merlot_tpu.nn.vit import VisionBackbone  # noqa: F401
