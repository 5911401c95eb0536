"""CLI orchestrator: python -m dipoorlet_tpu.

Flag and phase parity with /root/reference/dipoorlet/__main__.py:23-161:
  calibrate -> reduce -> weight-transform -> profile -> deploy.

Distribution model: SPMD over jax devices/processes (jax.distributed)
replaces torch.distributed+NCCL; rank-file reduction is kept only for
multi-process launches without a shared mesh — single-process multi-chip
runs reduce on device."""
from __future__ import annotations

import argparse
import copy
import os
import sys
import time


def build_parser():
    parser = argparse.ArgumentParser("dipoorlet_tpu")
    parser.add_argument("-M", "--model", help="onnx model")
    parser.add_argument("-I", "--input_dir", help="calibration data", required=True)
    parser.add_argument("-O", "--output_dir", help="output data path")
    parser.add_argument("-N", "--data_num", help="num of calibration pics", type=int, required=True)
    parser.add_argument("--we", help="weight equalization", action="store_true")
    parser.add_argument("--bc", help="bias correction", action="store_true")
    parser.add_argument("--update_bn", help="update BN", action="store_true")
    parser.add_argument("--adaround", help="Adaround", action="store_true")
    parser.add_argument("--brecq", help="BrecQ", action="store_true")
    parser.add_argument("--drop", help="QDrop", action="store_true")
    parser.add_argument("-A", "--act_quant", help="algorithm of activation quantization",
                        choices=["minmax", "hist", "mse", "kl"], default="mse")
    parser.add_argument("-D", "--deploy", help="deploy platform",
                        choices=["trt", "stpu", "magicmind", "rv", "atlas", "snpe", "ti", "imx"],
                        required=True)
    parser.add_argument("--bins", help="bins for histogram and kl", default=2048, type=int)
    parser.add_argument("--threshold", help="threshold for histogram", default=0.99999, type=float)
    parser.add_argument("--savefp", help="Save FP output of model.", action="store_true")
    parser.add_argument("--ada_bs", help="Batch size for adaround.", type=int, default=64)
    parser.add_argument("--ada_epoch", help="Epoch for adaround.", type=int, default=5000)
    parser.add_argument("--skip_layers", help="Skip layer name", default=[], type=str, nargs="+")
    parser.add_argument("--stpu_wg", help="Enable winograd for stpu.", action="store_true")
    parser.add_argument("--skip_prof_layer", help="Skip profiling by layer.",
                        default=False, action="store_true")
    parser.add_argument("--sparse", help="Sparse on/off", default=False, action="store_true")
    parser.add_argument("--smooth_quant", help="SmoothQuant activation-outlier "
                        "smoothing for LayerNorm->MatMul/Gemm groups (transformers).",
                        action="store_true")
    parser.add_argument("--sq_alpha", help="SmoothQuant migration strength alpha.",
                        type=float, default=0.5)
    parser.add_argument("--sparse_rate", help="Sparse rate", type=float, default=0.5)
    parser.add_argument("--pattern", help="Sparse pattern",
                        choices=["unstruction", "nv24"], default="unstruction")
    parser.add_argument("--stats_chunk", help="Max tensors tapped per compiled "
                        "calibration pass (bounds compile size and live stats "
                        "memory on transformer-scale graphs; 0 = single pass; "
                        "default 512 with --optim_transformer).",
                        type=int, default=0)
    parser.add_argument("--optim_transformer", help="Transformer model optimization",
                        default=False, action="store_true")
    parser.add_argument("--model_type", help="Transformer model type", choices=["unet"], default=None)
    parser.add_argument("--quant_format", default="QDQ", type=str, choices=["QOP", "QDQ"])
    parser.add_argument("--batch_size", help="Device batch size for calibration forwards.",
                        type=int, default=16)
    parser.add_argument("--w_bit", help="Override platform weight bit width (e.g. 4).",
                        type=int, default=None)
    parser.add_argument("--a_bit", help="Override platform activation bit width (e.g. 4).",
                        type=int, default=None)
    parser.add_argument("--seed", help="Deterministic seed offset for reconstruction "
                        "RNG (per-layer keys are stable crc32(name)+seed; identical "
                        "runs produce byte-identical artifacts).",
                        type=int, default=0)
    parser.add_argument("--bf16_calib", help="Run calibration stats forwards in "
                        "bfloat16 (the default: 2x HBM bandwidth; clip ranges "
                        "differ from fp32 only by bf16 rounding, <1%% relative "
                        "— measured in BASELINE.md/bench.py bf16_range_drift). "
                        "Reconstruction, profiling and the emitted quant "
                        "model stay fp32.",
                        action="store_true", default=None)
    parser.add_argument("--no_bf16_calib", help="Force fp32 calibration forwards "
                        "(bit-exact reference range semantics).",
                        action="store_true")
    parser.add_argument("--cpu", help="Force CPU backend (testing).", action="store_true")
    parser.add_argument("--no_mesh", help="Disable the automatic multi-chip data mesh "
                        "(run single-device even when multiple chips are visible).",
                        action="store_true")
    parser.add_argument("--multihost", help="Initialize jax.distributed for multi-host runs.",
                        action="store_true")
    parser.add_argument("--slurm", help="Launch task from slurm (alias of --multihost; "
                        "jax.distributed auto-detects the SLURM environment).",
                        default=False, action="store_true")
    parser.add_argument("--mpirun", help="Launch task from mpirun (alias of --multihost; "
                        "jax.distributed auto-detects the OMPI environment).",
                        default=False, action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS", "") == "axon":
        # keep the CPU backend available so constant folding / host evals
        # never dispatch eagerly over the device tunnel
        import jax
        jax.config.update("jax_platforms", "axon,cpu")

    if args.multihost or args.slurm or args.mpirun:
        import jax
        jax.distributed.initialize()

    import jax

    from .utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from .calib import tensor_calibration
    from .deploy import to_deploy
    from .graph import GraphIR
    from .profiling import (quantize_profiling_multipass, quantize_profiling_transformer,
                            show_model_profiling_res, show_model_ranges, weight_need_perchannel)
    from .utils.logging import logger, setup_logger
    from .utils.serialization import (reduce_profiling_res, save_clip_val,
                                      save_profiling_res)
    from .wtrans import weight_calibration

    # bfloat16 stats forwards are the default on accelerators; --no_bf16_calib
    # restores bit-exact fp32 range semantics
    if args.no_bf16_calib:
        args.bf16_calib = False
    elif args.bf16_calib is None:
        args.bf16_calib = True

    rank = jax.process_index()
    world_size = jax.process_count()
    setattr(args, "rank", rank)
    setattr(args, "world_size", world_size)
    setattr(args, "local_rank", 0)

    # single-controller multi-chip: shard calibration/reconstruction batches
    # over all local chips (the reference's one-process-per-GPU DP,
    # reference __main__.py:57-64, as SPMD over a 'data' mesh)
    mesh = None
    if not args.no_mesh:
        from .parallel import default_data_mesh
        mesh = default_data_mesh()
    setattr(args, "mesh", mesh)
    if mesh is not None:
        n_chips = mesh.devices.size
        for attr in ("batch_size", "ada_bs"):
            v = getattr(args, attr)
            if v % n_chips:
                setattr(args, attr, -(-v // n_chips) * n_chips)
    if world_size > 1:
        # reconstruction splits the GLOBAL minibatch across processes (and
        # each process's slice across its chips): keep it divisible
        m = world_size * (mesh.devices.size if mesh is not None else 1)
        if args.ada_bs % m:
            args.ada_bs = -(-args.ada_bs // m) * m
    if mesh is not None and rank == 0:
        print(f"dipoorlet_tpu: data-parallel over {mesh.devices.size} local devices "
              f"(batch_size={args.batch_size}, ada_bs={args.ada_bs}); --no_mesh disables",
              file=sys.stderr)

    if args.output_dir is None:
        model_path = os.path.dirname(os.path.abspath(args.model))
        args.output_dir = os.path.join(model_path, "results")
    if args.model_type is not None:
        args.optim_transformer = True
        args.skip_prof_layer = True
    if args.optim_transformer and args.stats_chunk == 0:
        args.stats_chunk = 512

    if rank == 0:
        os.makedirs(args.output_dir, exist_ok=True)
        setup_logger(args)

    start = time.time()
    if not args.model or not os.path.exists(args.model):
        logger.error("Model file not found: %s", args.model)
        sys.exit(1)
    onnx_graph = GraphIR.load(args.model, output_dir=args.output_dir,
                              deploy=args.deploy, model_type=args.model_type)
    if args.optim_transformer:
        # TPU-native stand-in for the reference's ORT transformer-optimizer
        # subprocess (reference __main__.py:85-89): fuse decomposed
        # LayerNorm/GELU patterns before calibration
        from .graph.transformer_opt import optimize_transformer
        optimize_transformer(onnx_graph)
    # detection exports: cut the data-dependent postprocess (NMS onward) so
    # the backbone+head calibrates statically (graph/passes.py rationale)
    from .graph.passes import truncate_for_static_execution
    removed_dyn = truncate_for_static_execution(onnx_graph)
    if removed_dyn and rank == 0:
        logger.info("Truncated %d dynamic postprocess node(s) at "
                    "NonMaxSuppression for static execution; quantizing the "
                    "backbone+head, new outputs: %s",
                    len(removed_dyn), list(onnx_graph.network_outputs))
    if rank == 0 and not args.optim_transformer:
        from .graph import validate_graph
        try:
            validate_graph(onnx_graph)
        except ValueError as e:
            logger.info("The onnx model is invalid: %s, please rectify your model "
                        "and restart dipoorlet_tpu.", e)
            sys.exit(1)

    # validate the calibration dataset up front: a missing directory or a
    # short sample range otherwise surfaces as a raw rc=-1 from the native
    # loader deep inside the first stats pass
    for inp in onnx_graph.network_inputs:
        d = os.path.join(args.input_dir, inp)
        last = os.path.join(d, f"{args.data_num - 1}.bin")
        if not os.path.isdir(d) or not os.path.exists(last):
            logger.error(
                "Calibration data missing: expected %s/<0..%d>.bin "
                "(reference layout input_dir/<input_name>/<idx>.bin, "
                "forward_net.py:459-464). Check -I/--input_dir and -N.",
                d, args.data_num - 1)
            sys.exit(1)

    if rank == 0:
        logger.info("Do tensor calibration...")
    act_clip_val, weight_clip_val = tensor_calibration(onnx_graph, args)

    if world_size > 1:
        # merge per-process clip values over DCN collectives (semantics of
        # utils.py:326-345); rank files still written as artifacts
        from .parallel import reduce_clip_val_collective
        save_clip_val(copy.deepcopy(act_clip_val), copy.deepcopy(weight_clip_val), args,
                      act_fname=f"act_clip_val.json.rank{rank}",
                      weight_fname=f"weight_clip_val.json.rank{rank}")
        act_clip_val = reduce_clip_val_collective(act_clip_val, args.act_quant)
        if rank == 0:
            save_clip_val(copy.deepcopy(act_clip_val), copy.deepcopy(weight_clip_val), args)
        _barrier()
    else:
        save_clip_val(copy.deepcopy(act_clip_val), copy.deepcopy(weight_clip_val), args)

    if rank == 0:
        logger.info("Weight transform...")
    graph, graph_ori, act_clip_val, weight_clip_val = weight_calibration(
        onnx_graph, act_clip_val, weight_clip_val, args)

    if rank == 0:
        logger.info("Profiling...")
    if args.model_type is not None:
        layer_cos, model_cos, quant_node_list = quantize_profiling_transformer(
            graph, graph_ori, act_clip_val, weight_clip_val, args)
    else:
        layer_cos, model_cos, quant_node_list = quantize_profiling_multipass(
            graph, graph_ori, act_clip_val, weight_clip_val, args)
    save_profiling_res(layer_cos, model_cos, args, rank=rank)
    _barrier()
    if rank == 0:
        layer_cos, model_cos = reduce_profiling_res(world_size, args)
        show_model_profiling_res(graph, layer_cos, model_cos, quant_node_list, args)
        show_model_ranges(graph, act_clip_val, weight_clip_val, args)
        weight_need_perchannel(graph, args)

    if rank == 0:
        logger.info("Deploy to " + args.deploy + "...")
        to_deploy(graph, act_clip_val, weight_clip_val, args)
        if args.quant_format == "QOP" and args.model_type is None:
            from .quant.qop_export import deploy_qoperator
            # post-weight-transform ranges: SmoothQuant/WE/BN-update
            # re-calibrate and introduce new tensors (e.g. _sq_scaled) —
            # a pre-WT snapshot would silently leave their consumers fp32
            deploy_qoperator(graph, act_clip_val, args)
        logger.info("Total time cost: {} seconds.".format(int(time.time() - start)))


def _barrier():
    """Cross-process sync: a tiny psum over all processes."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("dipoorlet_tpu_barrier")


if __name__ == "__main__":
    main()
