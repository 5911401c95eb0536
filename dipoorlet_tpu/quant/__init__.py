from .platform import LAYER_HAS_WEIGHT, platform_setting_table  # noqa: F401
from .qparams import QParams, compute_qparams  # noqa: F401
from .quant_graph import quant_graph, qparams_for_tensor, Q_SUFFIX, DQ_SUFFIX, QUANT_OP_TYPES  # noqa: F401
from .fake_quant import fake_quant, fake_quant_ste, quant_acti, ste_round  # noqa: F401
