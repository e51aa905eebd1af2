"""Crop-yield CLI — capability match for reference
`src/crop_yield/yield_main.py:12-253` (same flags, same model dispatch,
same RMSE-bu/acre + R^2 aggregation). Runs k-fold cross-validation over
the fold->test-year tables and prints/returns per-crop metrics.
"""

import argparse
import logging
from typing import Optional

from weathermodel_tpu.utils.config import TrainConfig, model_config_for_size
from weathermodel_tpu.ops.attention import resolve_attention_impl

logger = logging.getLogger(__name__)

YIELD_MODELS = (
    "weatherbert", "weatherformer", "weatherformersinusoid",
    "weatherformermixture", "weatherautoencoder", "weatherautoencodersine",
    "weatherautoencodermixture", "simmtm", "linear", "cnnrnn", "gnnrnn",
    "chronos",
)

# The reference names this model inconsistently: grid_search.py:542-558
# offers --model weatherautoencodersinusoid while yield_main.py:198 only
# dispatches "weatherautoencodersine" — the reference's own grid search
# crashes for it (docs/PARITY.md). We accept both spellings.
MODEL_ALIASES = {"weatherautoencodersinusoid": "weatherautoencodersine"}


def _run_gnnrnn_cv(args, crop_df, country: str) -> dict:
    """GNN-RNN runs through the SAME cross-validation machinery as every
    other yield model (GNNCrossValidator subclasses YieldCrossValidator):
    fold->test-year mapping, per-fold best-params checkpoint,
    yield_output.json, LR finder, and RMSE/R^2 aggregation all shared."""
    from weathermodel_tpu.models.gnn import GNNRNNYieldModel
    from weathermodel_tpu.train.gnn_trainer import GNNCrossValidator
    from weathermodel_tpu.utils.config import TrainConfig

    tcfg = TrainConfig(
        batch_size=args.batch_size, num_epochs=args.n_epochs,
        init_lr=args.init_lr, num_warmup_epochs=args.n_warmup_epochs,
        decay_factor=args.decay_factor, seed=args.seed,
        use_optimal_lr=args.use_optimal_lr,
    )
    cv = GNNCrossValidator(
        make_model=lambda n_past: GNNRNNYieldModel(n_past_years=n_past),
        model_cfg=None, train_cfg=tcfg, objective="mse", crop_df=crop_df,
        country=country, crop_type=args.crop_type,
        n_train_years=args.n_train_years, n_past_years=args.n_past_years,
        test_type=args.test_type, k_folds=args.cross_validation_k,
        workdir=args.workdir, test_year=args.test_year,
    )
    return cv.run()

# model name -> (yield model class factory, objective)
def _model_table():
    from weathermodel_tpu.models.yield_models import (
        LinearYieldModel,
        WeatherAutoencoderMixtureYieldModel,
        WeatherAutoencoderSineYieldModel,
        WeatherBERTYieldModel,
        WeatherFormerMixtureYieldModel,
        WeatherFormerSinusoidYieldModel,
        WeatherFormerYieldModel,
    )

    from weathermodel_tpu.models.chronos import ChronosYieldModel
    from weathermodel_tpu.models.cnn import CNNRNNYieldModel

    return {
        "weatherbert": (WeatherBERTYieldModel, "mse"),
        "weatherautoencoder": (WeatherBERTYieldModel, "mse"),
        "simmtm": (WeatherBERTYieldModel, "mse"),
        "weatherformer": (WeatherFormerYieldModel, "elbo"),
        "weatherformersinusoid": (WeatherFormerSinusoidYieldModel,
                                  "elbo_sinusoid"),
        "weatherformermixture": (WeatherFormerMixtureYieldModel,
                                 "elbo_mixture"),
        "weatherautoencodersine": (WeatherAutoencoderSineYieldModel,
                                   "elbo_sinusoid"),
        "weatherautoencodermixture": (WeatherAutoencoderMixtureYieldModel,
                                      "elbo_mixture"),
        "linear": (LinearYieldModel, "mse"),
        "cnnrnn": (CNNRNNYieldModel, "mse"),
        "chronos": (ChronosYieldModel, "mse"),
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="weatherformer",
                   help="one of: " + ", ".join(YIELD_MODELS))
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("--n-past-years", default=6, type=int)
    p.add_argument("--n-epochs", default=40, type=int)
    p.add_argument("--init-lr", default=5e-4, type=float)
    p.add_argument("--decay_factor", "--decay-factor", dest="decay_factor",
                   default=None, type=float)
    p.add_argument("--n-warmup-epochs", default=10, type=int)
    p.add_argument("--pretrained-model-path", default=None)
    p.add_argument("--model-size", default="small")
    p.add_argument("--n-train-years", default=5, type=int)
    p.add_argument("--beta", default=1e-4, type=float)
    p.add_argument("--n-mixture-components", default=1, type=int)
    p.add_argument("--crop-type", default="soybean")
    p.add_argument("--country", default="usa")
    p.add_argument("--test-type", default="extreme",
                   choices=("overall", "extreme", "ahead_pred"),
                   help="extreme (per-country/crop extreme-year table, the "
                        "reference default — yield_main.py:102-107), overall "
                        "(2014-18), or ahead_pred (2014-18, test_gap=4)")
    p.add_argument("--test-year", default=None, type=int,
                   help="pin a single test year (one fold) instead of the "
                        "test-type fold table (reference yield_main.py)")
    p.add_argument("--cross-validation-k", default=5, type=int)
    p.add_argument("--use-optimal-lr", action="store_true")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--attention-impl", default="auto",
                   choices=("auto", "pallas", "pallas_qkv", "xla"))
    p.add_argument("--compute-dtype", default="float32",
                   choices=("bfloat16", "float32"))
    p.add_argument("--seed", default=1234, type=int)
    p.add_argument("--workdir", default=None,
                   help="save per-fold best params + yield_output.json here")
    from weathermodel_tpu.utils.compilation_cache import add_flag

    add_flag(p)
    p.add_argument("--prng", default="rbg",
                   choices=("rbg", "threefry2x32"),
                   help="rbg = hardware-accelerated PRNG for masking/dropout"
                        " (deterministic per seed; threefry costs ~25%% of a"
                        " train step at batch 512)")
    return p


def run(args) -> dict:
    """Returns the aggregated CV dict + (avg_rmse, std_rmse, avg_r2, std_r2)
    (reference yield_main.py:230-253 contract)."""
    import pandas as pd

    from weathermodel_tpu.data.yield_data import (
        read_non_us_dataset,
        read_usa_dataset,
        synthetic_yield_df,
    )
    from weathermodel_tpu.train.yield_trainer import YieldCrossValidator
    from weathermodel_tpu.utils import constants

    args.model = MODEL_ALIASES.get(args.model, args.model)
    data_dir = args.data_dir or constants.DATA_DIR
    if getattr(args, "crop_df", None) is not None:
        crop_df = args.crop_df  # injected (grid search / tests)
    elif args.country.lower() == "usa":
        crop_df = read_usa_dataset(data_dir)
    elif args.country.lower() == "synthetic":
        crop_df = synthetic_yield_df(seed=args.seed)
    else:
        crop_df = read_non_us_dataset(data_dir, args.country.lower())

    k = args.n_mixture_components
    if args.model == "weatherformersinusoid" and k == 1:
        k = 4
    if args.model == "weatherformermixture" and k == 1:
        k = 7

    seq_len = (args.n_past_years + 1) * 52
    mcfg = model_config_for_size(
        args.model_size, k=k, max_len=seq_len,
        compute_dtype=args.compute_dtype,
    )
    tcfg = TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.n_epochs,
        init_lr=args.init_lr,
        num_warmup_epochs=args.n_warmup_epochs,
        decay_factor=args.decay_factor,
        beta=args.beta,
        use_optimal_lr=args.use_optimal_lr,
        seed=args.seed,
    )

    # synthetic data standardizes like USA (in-dataset z-score) — but the
    # remap must not route fold selection through USA's EXTREME_YEARS
    # table (whose first fold, 2003, predates the synthetic corpus):
    # the --test-type extreme reference default falls back to the overall
    # fold years for synthetic, mirroring select_test_years' fallback for
    # callers that pass country="synthetic" directly.
    country = "usa" if args.country.lower() == "synthetic" else args.country.lower()
    if args.country.lower() == "synthetic" and args.test_type == "extreme":
        args.test_type = "overall"
    if args.model == "gnnrnn":
        results = _run_gnnrnn_cv(args, crop_df, country)
        logger.info("Final average best RMSE for %s: %.3f +/- %.3f",
                    args.crop_type, results["avg_rmse_bu_acre"],
                    results["std_rmse_bu_acre"])
        return results

    model_cls, objective = _model_table()[args.model]
    if args.model == "linear":
        def make_model():
            return model_cls(mcfg, n_past_years=args.n_past_years,
                             seq_len=seq_len)
    elif args.model == "cnnrnn":
        def make_model():
            return model_cls(weather_dim=mcfg.weather_dim,
                             n_past_years=args.n_past_years)
    else:
        def make_model():
            return model_cls(mcfg, n_past_years=args.n_past_years,
                             attention_impl=resolve_attention_impl(
                                 args.attention_impl, args.model_size))

    pretrained = None
    if args.pretrained_model_path:
        from weathermodel_tpu.cli.pretrain import load_pretrained_params

        pretrained = load_pretrained_params(
            args.pretrained_model_path, mcfg.num_layers
        )

    cv = YieldCrossValidator(
        make_model=make_model, model_cfg=mcfg, train_cfg=tcfg,
        objective=objective, crop_df=crop_df, country=country,
        crop_type=args.crop_type, n_train_years=args.n_train_years,
        n_past_years=args.n_past_years, test_type=args.test_type,
        k_folds=args.cross_validation_k,
        pretrained_encoder_params=pretrained,
        workdir=args.workdir, test_year=args.test_year,
    )
    results = cv.run()
    logger.info(
        "Final average best RMSE for %s: %.3f +/- %.3f",
        args.crop_type, results["avg_rmse_bu_acre"],
        results["std_rmse_bu_acre"],
    )
    logger.info(
        "Final average R^2 for %s: %.3f +/- %.3f",
        args.crop_type, results["avg_r_squared"], results["std_r_squared"],
    )
    return results


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
    )
    args = build_parser().parse_args(argv)
    # validate BEFORE touching process-global jax config: a bad flag must
    # not leave the PRNG default flipped for an in-process caller
    args.model = MODEL_ALIASES.get(args.model, args.model)
    if args.model not in YIELD_MODELS:
        raise ValueError(
            f"Unknown model type: {args.model}. Choose one of "
            + ", ".join(YIELD_MODELS)
        )
    import jax

    jax.config.update("jax_default_prng_impl", args.prng)
    from weathermodel_tpu.utils.compilation_cache import enable_from_args

    enable_from_args(args)
    return run(args)


def cli() -> None:
    """Console-script entry: setuptools does sys.exit(fn()), so the
    programmatic result of main() (dict/path) must not leak into the
    process exit code."""
    main()


if __name__ == "__main__":
    cli()