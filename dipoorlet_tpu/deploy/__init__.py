"""Deploy parameter emitters for the 8 supported inference backends.

Format parity with /root/reference/dipoorlet/deploy/*.py — downstream
toolchains parse these files, so key names and value conventions match
byte-for-byte where practical."""
from ..quant.platform import platform_setting_table
from ..utils.dispatch import Registry
from ..utils.logging import logger


def _unknown_platform(*args, **kwargs):
    logger.warning("Deploy Platform Not Found!")


deploy_dispatcher = Registry("deploy-emitter", missing=_unknown_platform)


def to_deploy(graph, act_clip_val, weight_clip_val, args, **kwargs):
    """deploy_base.py:13-19: merge weight ranges iff platform deploy_weight."""
    if platform_setting_table[args.deploy]["deploy_weight"]:
        clip_val = act_clip_val.copy()
        clip_val.update(weight_clip_val)
    else:
        clip_val = act_clip_val
    deploy_dispatcher(args.deploy, graph, clip_val, args, **kwargs)


from . import trt, snpe, magicmind, ti, imx, atlas, rv, stpu  # noqa: F401,E402
