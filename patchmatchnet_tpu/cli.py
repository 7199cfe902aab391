"""Unified CLI: train / eval / fuse / convert subcommands.

Replaces the reference's three separate argparse drivers (train.py, eval.py,
train_dtu.py) with one typed-config entry point:

    python -m patchmatchnet_tpu.cli train --input_folder ... --train_list ...
    python -m patchmatchnet_tpu.cli eval  --input_folder ... --checkpoint_path ...
    python -m patchmatchnet_tpu.cli fuse  --input_folder ... --output_folder ...
    python -m patchmatchnet_tpu.cli convert --checkpoint_path X.ckpt --output Y.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

from patchmatchnet_tpu.config import Config


def _add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--patchmatch_interval_scale", nargs="+", type=float,
                   default=[0.005, 0.0125, 0.025])
    p.add_argument("--patchmatch_range", "--propagation_range", dest="propagation_range",
                   nargs="+", type=int, default=[6, 4, 2])
    p.add_argument("--patchmatch_iteration", nargs="+", type=int, default=[1, 2, 2])
    p.add_argument("--patchmatch_num_sample", nargs="+", type=int, default=[8, 8, 16])
    p.add_argument("--propagate_neighbors", nargs="+", type=int, default=[0, 8, 16])
    p.add_argument("--evaluate_neighbors", nargs="+", type=int, default=[9, 9, 9])
    p.add_argument("--precision", type=str, default="bf16", choices=["bf16", "f32"],
                   help="inference compute precision (bf16 payloads with f32 "
                   "weights/accumulation, or full f32)")
    p.add_argument("--train_precision", type=str, default="bf16",
                   choices=["bf16", "f32"],
                   help="training precision: bf16 = mixed precision (bf16 "
                   "payloads, f32 params/BN/loss/optimizer; ~1.4x faster on "
                   "TPU), f32 = exact reference-trainer parity")


def _add_data_args(p: argparse.ArgumentParser, eval_defaults: bool = False) -> None:
    p.add_argument("--input_folder", type=str, required=True)
    p.add_argument("--output_folder", type=str, default="")
    p.add_argument("--num_views", type=int, default=20 if eval_defaults else 5)
    p.add_argument("--image_max_dim", type=int, default=-1 if eval_defaults else 640)
    p.add_argument("--scan_list", type=str, default="")
    p.add_argument("--num_light_idx", type=int, default=-1)
    p.add_argument("--image_extension", type=str, default=".jpg")
    p.add_argument("--batch_size", type=int, default=1 if eval_defaults else 12)


def _add_fusion_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--geo_pixel_thres", type=float, default=1.0)
    p.add_argument("--geo_depth_thres", type=float, default=0.01)
    p.add_argument("--geo_mask_thres", type=int, default=5)
    p.add_argument("--photo_thres", type=float, default=0.5)
    p.add_argument("--file_format", type=str, default=".pfm", choices=[".bin", ".pfm"])


def _config_from_args(args) -> Config:
    cfg = Config()
    for name in vars(cfg.model):
        if hasattr(args, name):
            v = getattr(args, name)
            setattr(cfg.model, name, tuple(v) if isinstance(v, list) else v)
    for name in vars(cfg.data):
        if hasattr(args, name):
            setattr(cfg.data, name, getattr(args, name))
    for name in vars(cfg.train):
        if hasattr(args, name):
            setattr(cfg.train, name, getattr(args, name))
    for name in vars(cfg.fuse):
        if hasattr(args, name):
            setattr(cfg.fuse, name, getattr(args, name))
    return cfg


def _scan_names(scan_list: str) -> List[str]:
    if not scan_list:
        return [""]
    if not os.path.isfile(scan_list):
        raise FileNotFoundError(f"Invalid scan list file: {scan_list}")
    with open(scan_list) as f:
        return [line.rstrip() for line in f.readlines()]


def cmd_train(argv: List[str]) -> None:
    p = argparse.ArgumentParser(prog="patchmatchnet-tpu train")
    _add_data_args(p)
    _add_model_args(p)
    p.add_argument("--checkpoint_path", type=str, default="")
    p.add_argument("--train_list", type=str, required=True)
    p.add_argument("--test_list", type=str, required=True)
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--robust_train", action="store_true", default=False)
    p.add_argument("--dataset", type=str, default="unified",
                   choices=["unified", "dtu_legacy"],
                   help="unified cams/pair layout or raw DTU (train_dtu path)")
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--lr_epochs", type=str, default="10,12,14:2")
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--summary_freq", type=int, default=20)
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--rand_seed", type=int, default=1)
    p.add_argument("--ckpt_backend", type=str, default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="training checkpoint backend: portable msgpack files "
                   "or orbax directories (atomic commits, sharded restore)")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler device trace into this dir")
    args = p.parse_args(argv)
    if not args.output_folder:
        args.output_folder = args.input_folder

    from patchmatchnet_tpu.train.driver import run_training

    cfg = _config_from_args(args)
    run_training(cfg, num_devices=args.num_devices, profile_dir=args.profile_dir)


def cmd_eval(argv: List[str]) -> None:
    p = argparse.ArgumentParser(prog="patchmatchnet-tpu eval")
    _add_data_args(p, eval_defaults=True)
    _add_model_args(p)
    _add_fusion_args(p)
    p.add_argument("--checkpoint_path", type=str, required=True)
    p.add_argument("--input_type", type=str, default="params",
                   choices=["params", "module"],
                   help="'params': weights checkpoint (.msgpack or torch "
                   ".ckpt); 'module': exported StableHLO inference artifact "
                   "(the reference's TorchScript-module analog, eval.py:22-39)")
    p.add_argument("--output_type", type=str, default="both",
                   choices=["depth", "fusion", "both"])
    p.add_argument("--num_devices", type=int, default=None,
                   help="shard eval batches over a data-parallel mesh of "
                   "this many chips (each chip owns whole reference views); "
                   "batch_size must be a multiple")
    p.add_argument("--shape_bucket", type=int, default=0,
                   help="round image sizes up to this multiple (edge-pad, "
                   "crop outputs back) so mixed-size datasets (ETH3D) reuse "
                   "a few compiled shapes instead of recompiling per size; "
                   "0 = exact shapes")
    p.add_argument("--no_derive_windows", dest="derive_windows",
                   action="store_false", default=True,
                   help="disable the per-scene windowed-sampler window "
                   "derivation (ops/pallas/window_bounds) and fall back to "
                   "the measured-envelope defaults + escape-demote")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if not args.output_folder:
        args.output_folder = args.input_folder

    cfg = _config_from_args(args)

    if args.output_type in ("depth", "both"):
        from patchmatchnet_tpu.data import BatchLoader, MVSDataset
        from patchmatchnet_tpu.infer import (
            DepthEstimator,
            ModuleEstimator,
            save_depth_maps,
        )
        from patchmatchnet_tpu.train.driver import build_model, load_any_checkpoint

        mesh = None
        if args.num_devices and args.num_devices > 1:
            from patchmatchnet_tpu.parallel import make_mesh

            mesh = make_mesh(args.num_devices)
            if args.batch_size % args.num_devices != 0:
                raise ValueError(
                    f"batch_size {args.batch_size} must be a multiple of "
                    f"--num_devices {args.num_devices}"
                )
        if args.input_type == "module":
            with open(args.checkpoint_path, "rb") as f:
                estimator = ModuleEstimator(f.read())
        else:
            variables = load_any_checkpoint(args.checkpoint_path)
            estimator = DepthEstimator(
                variables,
                build_model(cfg, inference=True),
                mesh=mesh,
                bucket_multiple=args.shape_bucket,
                derive_windows=args.derive_windows,
            )
        dataset = MVSDataset(
            args.input_folder,
            num_views=args.num_views,
            max_dim=args.image_max_dim,
            scan_list=args.scan_list,
            num_light_idx=args.num_light_idx,
            image_extension=args.image_extension,
        )
        loader = BatchLoader(dataset, args.batch_size, shuffle=False)
        n = save_depth_maps(
            estimator, loader, args.output_folder, args.file_format, seed=args.seed
        )
        print(f"Wrote {n} depth/confidence map pairs")

    if args.output_type in ("fusion", "both"):
        from patchmatchnet_tpu.infer import FusionConfig, filter_and_fuse

        fusion_cfg = FusionConfig(
            image_max_dim=args.image_max_dim,
            geo_pixel_thres=args.geo_pixel_thres,
            geo_depth_thres=args.geo_depth_thres,
            geo_mask_thres=args.geo_mask_thres,
            photo_thres=args.photo_thres,
            file_format=args.file_format,
            image_extension=args.image_extension,
        )
        for scan in _scan_names(args.scan_list):
            filter_and_fuse(args.input_folder, args.output_folder, scan, fusion_cfg)


def cmd_fuse(argv: List[str]) -> None:
    p = argparse.ArgumentParser(prog="patchmatchnet-tpu fuse")
    p.add_argument("--input_folder", type=str, required=True)
    p.add_argument("--output_folder", type=str, default="")
    p.add_argument("--scan_list", type=str, default="")
    p.add_argument("--image_max_dim", type=int, default=-1)
    p.add_argument("--image_extension", type=str, default=".jpg")
    _add_fusion_args(p)
    args = p.parse_args(argv)
    if not args.output_folder:
        args.output_folder = args.input_folder

    from patchmatchnet_tpu.infer import FusionConfig, filter_and_fuse

    fusion_cfg = FusionConfig(
        image_max_dim=args.image_max_dim,
        geo_pixel_thres=args.geo_pixel_thres,
        geo_depth_thres=args.geo_depth_thres,
        geo_mask_thres=args.geo_mask_thres,
        photo_thres=args.photo_thres,
        file_format=args.file_format,
        image_extension=args.image_extension,
    )
    for scan in _scan_names(args.scan_list):
        filter_and_fuse(args.input_folder, args.output_folder, scan, fusion_cfg)


def cmd_convert(argv: List[str]) -> None:
    p = argparse.ArgumentParser(prog="patchmatchnet-tpu convert")
    p.add_argument("--checkpoint_path", type=str, required=True,
                   help="torch params_*.ckpt from the reference")
    p.add_argument("--output", type=str, required=True, help="output .msgpack path")
    args = p.parse_args(argv)

    from patchmatchnet_tpu.compat import convert_torch_checkpoint, save_variables

    variables = convert_torch_checkpoint(args.checkpoint_path)
    save_variables(args.output, variables)
    import jax

    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"Converted {args.checkpoint_path} -> {args.output} ({n} values)")


def cmd_export(argv: List[str]) -> None:
    p = argparse.ArgumentParser(prog="patchmatchnet-tpu export")
    p.add_argument("--checkpoint_path", type=str, required=True)
    p.add_argument("--output", type=str, required=True, help="output .stablehlo path")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--num_views", type=int, default=5)
    p.add_argument("--height", type=int, default=864)
    p.add_argument("--width", type=int, default=1152)
    args = p.parse_args(argv)

    from patchmatchnet_tpu.compat import export_inference
    from patchmatchnet_tpu.train.driver import load_any_checkpoint

    variables = load_any_checkpoint(args.checkpoint_path)
    blob = export_inference(
        variables, args.batch, args.num_views, args.height, args.width
    )
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"Exported AOT inference artifact -> {args.output} ({len(blob)} bytes)")


def cmd_colmap_import(argv: List[str]) -> None:
    from patchmatchnet_tpu.tools.colmap_import import main as colmap_import_main

    colmap_import_main(argv)


def cmd_colmap_export(argv: List[str]) -> None:
    from patchmatchnet_tpu.tools.colmap_export import main as colmap_export_main

    colmap_export_main(argv)


def cmd_convert_dtu(argv: List[str]) -> None:
    from patchmatchnet_tpu.tools.convert_dtu import main as convert_dtu_main

    convert_dtu_main(argv)


def cmd_convert_eth3d(argv: List[str]) -> None:
    from patchmatchnet_tpu.tools.convert_eth3d import main as convert_eth3d_main

    convert_eth3d_main(argv)


def cmd_visualize(argv: List[str]) -> None:
    from patchmatchnet_tpu.tools.visualize import main as visualize_main

    visualize_main(argv)


COMMANDS = {
    "train": cmd_train,
    "eval": cmd_eval,
    "fuse": cmd_fuse,
    "convert": cmd_convert,
    "export": cmd_export,
    "colmap-import": cmd_colmap_import,
    "colmap-export": cmd_colmap_export,
    "convert-dtu": cmd_convert_dtu,
    "convert-eth3d": cmd_convert_eth3d,
    "visualize": cmd_visualize,
}


def main(argv: Optional[List[str]] = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("commands:", ", ".join(COMMANDS))
        return
    cmd = argv[0]
    if cmd not in COMMANDS:
        raise SystemExit(f"Unknown command {cmd!r}; choose from {list(COMMANDS)}")
    COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    main()
