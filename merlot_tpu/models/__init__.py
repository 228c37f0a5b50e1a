from merlot_tpu.models.config import MerlotConfig  # noqa: F401
from merlot_tpu.models.merlot import MerlotModel  # noqa: F401
from merlot_tpu.models.pretrain import MerlotPretrainModel  # noqa: F401
