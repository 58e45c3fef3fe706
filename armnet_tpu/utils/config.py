"""Experiment config + CLI, flag-compatible with the reference surface
(/root/reference/train.py:15-50) plus TPU-native extras (mesh, sharded
embedding, precision, kernels)."""

import argparse
import dataclasses
from typing import Optional

from armnet_tpu.models.config import ModelConfig

__all__ = ["ExperimentConfig", "get_args", "build_arg_parser"]


@dataclasses.dataclass
class ExperimentConfig(ModelConfig):
    # optimizer
    epoch: int = 100
    patience: int = 1
    batch_size: int = 4096
    lr: float = 0.003
    eval_freq: int = 10000          # max batches per epoch, every split
    clip: float = 1.0               # elementwise grad clamp bound
    # dataset
    dataset: str = "frappe"
    data_dir: str = "./data/"
    workers: int = 4                # accepted for CLI parity (prefetch is async)
    valid_perc: float = 0.0         # UCI path: validation split carved from train
    # log & checkpoint
    log_dir: str = "./log/"
    report_freq: int = 30
    seed: int = 2025
    repeat: int = 1
    exp_name: str = "test"
    ckpt_dir: Optional[str] = None
    resume: Optional[str] = None
    # TPU-native extras
    matmul_precision: str = "default"   # default|high|highest
    bf16: bool = False                  # bf16 activations on the MXU path
    kernels: str = "auto"               # auto|xla|pallas compute-path selection
    mesh: str = ""                      # e.g. "data:8" or "data:4,model:2"
    shard_embedding: bool = False       # row-shard tables over the model axis
    embedding_exchange: str = "psum"    # psum|a2a row-exchange strategy
    embedding_capacity_factor: float = 2.0  # a2a per-shard bucket headroom
    profile_dir: Optional[str] = None   # jax.profiler trace output
    debug_nans: bool = False            # jax_debug_nans: fail fast on NaN/Inf


def build_arg_parser():
    d = ExperimentConfig()
    p = argparse.ArgumentParser(description="armnet_tpu framework")
    p.add_argument("--exp_name", default=d.exp_name, type=str,
                   help="exp name for log & checkpoint")
    # model config (reference-compatible names)
    p.add_argument("--model", default="armnet", type=str,
                   help="model type: lr fm hofm afm dcn cin afn armnet "
                        "armnet_1h dnn gcn gat wd ipnn kpnn nfm dfm dcn+ "
                        "xdfm gc_arm sa_glu")
    p.add_argument("--nfeat", type=int, default=d.nfeat,
                   help="the number of features")
    p.add_argument("--nfield", type=int, default=d.nfield,
                   help="the number of fields")
    p.add_argument("--nemb", type=int, default=d.nemb, help="embedding size")
    p.add_argument("--k", type=int, default=d.k,
                   help="interaction order for hofm/dcn/cin/gcn/gat/xdfm")
    p.add_argument("--h", type=int, default=d.h,
                   help="afm/cin/afn/armnet/gcn/gat hidden features/neurons")
    p.add_argument("--mlp_nlayer", type=int, default=d.mlp_nlayer,
                   help="the number of mlp layers")
    p.add_argument("--mlp_nhid", type=int, default=d.mlp_nhid,
                   help="mlp hidden units")
    p.add_argument("--dropout", default=d.dropout, type=float,
                   help="dropout rate")
    p.add_argument("--nattn_head", type=int, default=d.nattn_head,
                   help="the number of attention heads, gat/armnet")
    # AFN/ARMNet extras
    p.add_argument("--ensemble", action="store_true", default=False,
                   help="to ensemble with DNNs")
    p.add_argument("--dnn_nlayer", type=int, default=d.dnn_nlayer,
                   help="the number of ensemble-DNN layers")
    p.add_argument("--dnn_nhid", type=int, default=d.dnn_nhid,
                   help="ensemble-DNN hidden units")
    p.add_argument("--alpha", default=d.alpha, type=float,
                   help="entmax alpha to control sparsity")
    # optimizer
    p.add_argument("--epoch", type=int, default=d.epoch,
                   help="number of maximum epochs")
    p.add_argument("--patience", type=int, default=d.patience,
                   help="number of epochs for stopping training")
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--lr", default=d.lr, type=float, help="learning rate")
    p.add_argument("--eval_freq", type=int, default=d.eval_freq,
                   help="max number of batches to train per epoch")
    p.add_argument("--clip", type=float, default=d.clip,
                   help="elementwise gradient clamp bound")
    # dataset
    p.add_argument("--dataset", type=str, default=d.dataset)
    p.add_argument("--data_dir", type=str, default=d.data_dir)
    p.add_argument("--workers", default=d.workers, type=int,
                   help="accepted for parity; loading is async prefetch")
    p.add_argument("--valid_perc", type=float, default=d.valid_perc,
                   help="UCI path: validation fraction carved from train")
    p.add_argument("--noutput", type=int, default=d.noutput,
                   help="output classes (1 = binary CTR; UCI arff datasets "
                        "auto-set this to nclass)")
    # log & checkpoint
    p.add_argument("--log_dir", type=str, default=d.log_dir)
    p.add_argument("--report_freq", type=int, default=d.report_freq)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--repeat", type=int, default=d.repeat,
                   help="number of repeats with seeds [seed, seed+repeat)")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="directory for checkpoint/resume (best + last)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint directory to resume from")
    # TPU-native extras
    p.add_argument("--matmul_precision", type=str, default=d.matmul_precision,
                   choices=["default", "high", "highest"])
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--kernels", type=str, default=d.kernels,
                   choices=["auto", "xla", "pallas", "pallas-fused"])
    p.add_argument("--mesh", type=str, default=d.mesh,
                   help="device mesh spec, e.g. 'data:8' or 'data:4,model:2'")
    p.add_argument("--shard_embedding", action="store_true", default=False)
    p.add_argument("--embedding_exchange", type=str,
                   default=d.embedding_exchange, choices=["psum", "a2a"],
                   help="row-sharded table exchange: psum all-reduces partial "
                        "rows; a2a is the DLRM-style request/response "
                        "(~half the volume, needs capacity headroom)")
    p.add_argument("--embedding_capacity_factor", type=float,
                   default=d.embedding_capacity_factor,
                   help="a2a per-shard bucket size multiplier over the "
                        "uniform-hash expectation; overflowing requests drop "
                        "to zero rows and are counted in the overflow meter. "
                        "<= 0 auto-sizes from the first batches' id histogram "
                        "(zero drops without hand-tuning)")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--debug_nans", action="store_true", default=False,
                   help="enable jax_debug_nans (fail fast on NaN/Inf)")
    return p


def get_args(argv=None) -> ExperimentConfig:
    ns = build_arg_parser().parse_args(argv)
    return ExperimentConfig(**vars(ns))
