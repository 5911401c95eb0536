"""Per-platform quantization policy table.

Data parity with the reference's platform_setting_table
(/root/reference/dipoorlet/platform_settings.py:1-184): quantizable op
sets, weight/activation/bias bit-widths, symmetry, per-channel, log-scale,
dynamic-sym, network-output quantization and deploy-weight flags for the
8 supported inference backends."""
from __future__ import annotations

LAYER_HAS_WEIGHT = ["Conv", "Gemm", "ConvTranspose", "PRelu", "BatchNormalization"]

_BASIC_QUANT_NODES = [
    "Relu", "Eltwise", "MaxPool", "Conv", "Gemm", "ConvTranspose", "PRelu",
    "AveragePool", "Concat", "Split", "Add", "Mul", "Abs", "Reciprocal", "Sigmoid",
]


def _spec(bit_width=8, symmetric=True, per_channel=None, log_scale=None, dynamic_sym=None):
    d = {"bit_width": bit_width, "type": "Linear", "symmetric": symmetric}
    if per_channel is not None:
        d["per_channel"] = per_channel
    if log_scale is not None:
        d["log_scale"] = log_scale
    if dynamic_sym is not None:
        d["dynamic_sym"] = dynamic_sym
    return d


platform_setting_table = {
    # platform_settings.py:6-22
    "trt": {
        "quant_nodes": ["Relu", "MaxPool", "Conv", "Gemm", "ConvTranspose", "PRelu",
                        "AveragePool", "Add", "Sigmoid"],
        "qw_params": _spec(symmetric=True, per_channel=True),
        "qi_params": _spec(symmetric=True),
        "quantize_network_output": False,
        "deploy_weight": False,
    },
    # platform_settings.py:25-41
    "stpu": {
        "quant_nodes": _BASIC_QUANT_NODES + ["Clip", "HardSigmoid"],
        "qi_params": _spec(symmetric=True),
        "qw_params": _spec(symmetric=True, per_channel=False),
        "quantize_network_output": False,
        "deploy_weight": True,
    },
    # platform_settings.py:44-62
    "magicmind": {
        "quant_nodes": ["Gemm", "Conv", "ConvTranspose", "MatMul"],
        "qw_params": _spec(symmetric=False, per_channel=True, log_scale=False),
        "qi_params": _spec(symmetric=False, log_scale=False),
        "quantize_network_output": False,
        "deploy_weight": False,
    },
    # platform_settings.py:65-81
    "rv": {
        "quant_nodes": list(_BASIC_QUANT_NODES),
        "qi_params": _spec(symmetric=False),
        "qw_params": _spec(symmetric=False, per_channel=False),
        "quantize_network_output": True,
        "deploy_weight": True,
    },
    # platform_settings.py:87-102
    "atlas": {
        "quant_nodes": ["Conv", "Gemm", "AveragePool"],
        "qw_params": _spec(symmetric=True, per_channel=True),
        "qi_params": _spec(symmetric=False),
        "quantize_network_output": False,
        "deploy_weight": False,
    },
    # platform_settings.py:107-123
    "snpe": {
        "quant_nodes": _BASIC_QUANT_NODES + ["Sigmoid"],
        "qw_params": _spec(symmetric=False, per_channel=False),
        "qi_params": _spec(symmetric=False),
        "quantize_network_output": True,
        "deploy_weight": False,
    },
    # platform_settings.py:134-153
    "ti": {
        "quant_nodes": list(_BASIC_QUANT_NODES),
        "qw_params": _spec(symmetric=True, per_channel=False, log_scale=False),
        "qi_params": _spec(symmetric=True, dynamic_sym=True, log_scale=True),
        "quantize_network_output": False,
        "deploy_weight": False,
    },
    # platform_settings.py:155-173
    "imx": {
        "quant_nodes": list(_BASIC_QUANT_NODES),
        "qw_params": _spec(symmetric=True, per_channel=True, log_scale=True),
        "qi_params": _spec(symmetric=True, log_scale=True),
        "quantize_network_output": True,
        "deploy_weight": True,
    },
}

# NOTE: the reference table also carries "deploy_exclude_layers"
# (platform_settings.py:7 etc.) but every entry is [] and nothing ever reads
# it — dead config. Deliberately not carried here.


def effective_setting(args) -> dict:
    """Platform settings with optional CLI bit-width overrides
    (--w_bit/--a_bit): the reference pins 8-bit in its table; low-bit
    (W4A8/W4A4) reconstruction runs need this extension."""
    setting = platform_setting_table[args.deploy]
    w_bit = getattr(args, "w_bit", None)
    a_bit = getattr(args, "a_bit", None)
    if not w_bit and not a_bit:
        return setting
    setting = {k: (dict(v) if isinstance(v, dict) else v) for k, v in setting.items()}
    if w_bit:
        setting["qw_params"]["bit_width"] = int(w_bit)
        if "qb_params" in setting:
            setting["qb_params"]["bit_width"] = int(w_bit)
    if a_bit:
        setting["qi_params"]["bit_width"] = int(a_bit)
    return setting
