from merlot_tpu.ops.activations import gelu  # noqa: F401
from merlot_tpu.ops.norms import layer_norm, group_norm, standardize_kernel  # noqa: F401
from merlot_tpu.ops.losses import cross_entropy_with_logits  # noqa: F401
from merlot_tpu.ops.sampling import gumbel_topk_without_replacement  # noqa: F401
