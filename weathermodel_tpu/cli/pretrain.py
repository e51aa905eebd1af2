"""Pretraining CLI — capability match for reference
`src/pretraining/pretraining_main.py:20-135` (same flag names, same model
dispatch). `wm-pretrain --model weatherformer --model-size small ...`

No torchrun/DDP launch step: the train step is compiled over the local
device mesh automatically (SURVEY.md §2.11 — DDP/NCCL becomes jit+psum).
"""

import argparse
import logging

from weathermodel_tpu.utils.config import (
    ModelConfig,
    TrainConfig,
    model_config_for_size,
)

logger = logging.getLogger(__name__)

PRETRAIN_MODELS = (
    "weatherbert", "weatherformer", "weatherformersinusoid",
    "weatherformermixture", "weatherautoencoder", "simmtm", "mlp",
    "weathercnn",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="weatherformer",
                   help="one of: " + ", ".join(PRETRAIN_MODELS))
    p.add_argument("--resume-from-checkpoint", default=None,
                   help="workdir to resume full training state from")
    p.add_argument("--pretrained-model-path", default=None,
                   help="params checkpoint (orbax dir or reference .pth) to "
                        "transfer from before training")
    p.add_argument("--batch-size", default=256, type=int)
    p.add_argument("--n-masked-features", default=10, type=int)
    p.add_argument("--n-epochs", default=100, type=int)
    p.add_argument("--init-lr", default=5e-4, type=float)
    p.add_argument("--use-optimal-lr", action="store_true")
    p.add_argument("--n-warmup-epochs", default=10, type=int)
    p.add_argument("--decay-factor", default=0.99, type=float)
    p.add_argument("--model-size", default="small",
                   help="mini (60K), small (2M), medium (8M), large (56M)")
    p.add_argument("--masking-prob", default=0.30, type=float)
    p.add_argument("--n-mixture-components", default=1, type=int)
    p.add_argument("--beta", default=0.5, type=float)
    p.add_argument("--freqs", default="weekly",
                   help="comma-separated granularities to stream together "
                        "(daily,weekly,monthly) — multi-scale temporal "
                        "pretraining; per-frequency year/interval derivation "
                        "(reference nasa_power/dataloader.py:12-26)")
    p.add_argument("--data-dir", default=None,
                   help="chunk-store root (default: WEATHERMODEL_DATA_DIR)")
    p.add_argument("--workdir", default="checkpoints/pretraining")
    p.add_argument("--attention-impl", default="auto",
                   choices=("auto", "pallas", "pallas_qkv", "xla"),
                   help="--attention-impl xla disables the fused kernel "
                        "(numerics debugging; reference = stock torch)")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder layers in backward (trade "
                        "FLOPs for HBM; for large models / long sequences)")
    p.add_argument("--seq-parallel", default=1, type=int,
                   help="shard the sequence dim over N devices; attention "
                        "runs as an exact ring over ICI (requires "
                        "max_len %% N == 0; beyond-reference scale-out)")
    p.add_argument("--pipeline-stages", default=1, type=int,
                   help="stage the encoder layers over N devices (GPipe "
                        "schedule; requires num_layers %% N == 0)")
    p.add_argument("--pipeline-microbatches", default=4, type=int,
                   help="microbatches streamed through the pipeline")
    p.add_argument("--tensor-parallel", default=1, type=int,
                   help="shard params Megatron-style (and MoE experts, "
                        "expert-parallel) over a 'model' mesh axis of "
                        "this size; composes with --fsdp (2-D sharding)")
    p.add_argument("--moe-experts", default=0, type=int,
                   help="num_experts > 0 swaps the dense FFN for a top-k "
                        "routed Mixture-of-Experts FFN, expert-parallel "
                        "over the mesh's 'model' axis (models/moe.py)")
    p.add_argument("--moe-top-k", default=2, type=int)
    p.add_argument("--moe-dispatch", default="ragged",
                   choices=("sort", "ragged", "scatter"),
                   help="MoE data movement: DROPLESS grouped-GEMM on real "
                        "per-expert counts (ragged, the default — fastest "
                        "measured, zero drops, composes with "
                        "--tensor-parallel via shard_map; ignores "
                        "--moe-capacity-factor), stable-argsort capacity "
                        "layout (sort — required by int8_static serving), "
                        "or per-row scatter (scatter); sort==scatter "
                        "numerics, measured A/Bs in BASELINE.md")
    p.add_argument("--moe-capacity-factor", default=1.25, type=float,
                   help="per-expert capacity = cf * top_k * T / E (sort/"
                        "scatter dispatch; over-capacity tokens drop). "
                        "Lower cf = less padded MXU work, more drops — "
                        "measured sweep in BASELINE.md")
    p.add_argument("--moe-remat", action="store_true",
                   help="rematerialize the expert FFN in the backward pass "
                        "(~3x larger batch fits in HBM, ~30%% slower per "
                        "step single-chip — see BASELINE.md MoE section)")
    p.add_argument("--grad-accum", default=1, type=int,
                   help="split each batch into N microbatches and "
                        "accumulate gradients under lax.scan (peak "
                        "activation memory = one microbatch) before a "
                        "single optimizer update — for configs whose "
                        "optimal batch does not fit HBM")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer moments over the 'data' "
                        "mesh axis (ZeRO-3-style; per-chip state memory / "
                        "n_devices, gathers ride ICI)")
    from weathermodel_tpu.utils.compilation_cache import add_flag

    add_flag(p)
    p.add_argument("--prng", default="rbg",
                   choices=("rbg", "threefry2x32"),
                   help="rbg = hardware-accelerated PRNG for masking/dropout"
                        " (deterministic per seed; threefry costs ~25%% of a"
                        " train step at batch 512)")
    return p


def make_model(name: str, cfg: ModelConfig, attention_impl: str,
               remat: bool = False, ffn_impl: str = "xla"):
    from weathermodel_tpu.models import (
        SimMTM,
        WeatherAutoencoder,
        WeatherBERT,
        WeatherFormer,
        WeatherFormerMixture,
        WeatherFormerSinusoid,
    )
    from weathermodel_tpu.models.mlp import WeatherMLP

    table = {
        "weatherbert": WeatherBERT,
        "weatherformer": WeatherFormer,
        "weatherformersinusoid": WeatherFormerSinusoid,
        "weatherformermixture": WeatherFormerMixture,
        "weatherautoencoder": WeatherAutoencoder,
        "simmtm": SimMTM,
    }
    if name == "mlp":
        return WeatherMLP(cfg)
    if name == "weathercnn":
        # ✚ working redesign of the reference's shape-broken standalone CNN
        # pretraining path (weathercnn_trainer.py; see models/cnn.py).
        from weathermodel_tpu.models.cnn import WeatherCNNPretrain

        return WeatherCNNPretrain(cfg.weather_dim, cfg.max_len)
    if name not in table:
        raise ValueError(
            f"Unknown model type: {name}. Choose one of "
            + ", ".join(PRETRAIN_MODELS)
        )
    return table[name](cfg, attention_impl=attention_impl, remat=remat,
                       ffn_impl=ffn_impl)


# CLI model name -> internal trainer key (OBJECTIVE_FOR_MODEL)
TRAINER_KEY = {
    "weatherbert": "weatherbert",
    "weatherformer": "weatherformer",
    "weatherformersinusoid": "weatherformer_sinusoid",
    "weatherformermixture": "weatherformer_mixture",
    "weatherautoencoder": "weatherautoencoder",
    "simmtm": "simmtm",
    "mlp": "mlp",
    "weathercnn": "weathercnn",
}


def load_pretrained_params(path: str, num_layers: int):
    """Accepts an orbax params dir or a reference torch .pth file."""
    if path.endswith((".pth", ".pt")):
        from weathermodel_tpu.models.transfer import convert_torch_checkpoint

        return convert_torch_checkpoint(path, num_layers)
    import os

    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path))


def run(args: argparse.Namespace) -> dict:
    from weathermodel_tpu.data.pretraining import (
        PretrainDataConfig,
        pretrain_batches,
    )
    from weathermodel_tpu.train.trainer import PretrainTrainer
    from weathermodel_tpu.utils import constants

    k = args.n_mixture_components
    if args.model == "weatherformersinusoid" and k == 1:
        k = 4   # model defaults (reference weatherformer_sinusoid.py:22)
    if args.model == "weatherformermixture" and k == 1:
        k = 7   # reference weatherformer_mixture.py:24

    if args.moe_experts > 0 and args.model in ("mlp", "weathercnn"):
        # these models have no transformer FFN to replace; silently
        # training dense under an MoE flag would mislead
        raise ValueError(
            f"--moe-experts is not supported for --model {args.model} "
            "(no transformer encoder trunk)"
        )
    mcfg = model_config_for_size(
        args.model_size, k=k, compute_dtype=args.compute_dtype,
        num_experts=args.moe_experts, moe_top_k=args.moe_top_k,
        moe_remat=args.moe_remat, moe_dispatch=args.moe_dispatch,
        moe_capacity_factor=args.moe_capacity_factor,
    )
    tcfg = TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.n_epochs,
        init_lr=args.init_lr,
        num_warmup_epochs=int(args.n_warmup_epochs),
        decay_factor=args.decay_factor,
        masking_prob=args.masking_prob,
        n_masked_features=args.n_masked_features,
        beta=args.beta,
        use_optimal_lr=args.use_optimal_lr,
    )
    dcfg = PretrainDataConfig(
        data_dir=args.data_dir or constants.DATA_DIR,
        batch_size=args.batch_size,
        freqs=tuple(f.strip() for f in args.freqs.split(",") if f.strip()),
    )

    def make_loaders(split, shuffle, seed):
        return pretrain_batches(split, dcfg, shuffle=shuffle, seed=seed)

    from weathermodel_tpu.ops.attention import resolve_attention_impl

    attention_impl = resolve_attention_impl(args.attention_impl,
                                            args.model_size)
    if args.seq_parallel > 1:
        attention_impl = "ring"  # sequence-parallel exact ring attention
    model = make_model(args.model, mcfg, attention_impl,
                       remat=args.remat)
    pretrained = None
    if args.pretrained_model_path:
        pretrained = load_pretrained_params(
            args.pretrained_model_path, mcfg.num_layers
        )
    trainer = PretrainTrainer(
        model, TRAINER_KEY[args.model], mcfg, tcfg, make_loaders,
        workdir=args.workdir,
        pretrained_params=pretrained,
        resume=args.resume_from_checkpoint is not None,
        fsdp=args.fsdp,
        seq_parallel=args.seq_parallel,
        pipeline_stages=args.pipeline_stages,
        pipeline_microbatches=args.pipeline_microbatches,
        tensor_parallel=args.tensor_parallel,
        grad_accum=args.grad_accum,
    )
    return trainer.train()


def main():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
    )
    args = build_parser().parse_args()
    import jax

    jax.config.update("jax_default_prng_impl", args.prng)
    from weathermodel_tpu.utils.compilation_cache import enable_from_args

    enable_from_args(args)
    logger.info("Command-line arguments:")
    for k, v in vars(args).items():
        logger.info("%s: %s", k, v)
    result = run(args)
    logger.info("Training complete: %s", result)


if __name__ == "__main__":
    main()
