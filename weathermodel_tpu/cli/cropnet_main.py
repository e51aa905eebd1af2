"""CropNet CLI — capability match for reference
`src/crop_yield/cropnet_main.py:182-260`: per-crop loop over
Cotton/Corn/Soybeans/WinterWheat (or a single --crop-type), single fold
(k = 1) with test year 2021, per-crop try/except so one failure doesn't
kill the run, RMSE summary in original units."""

import argparse
import logging
from typing import Dict, Optional, Tuple

from weathermodel_tpu.utils.config import TrainConfig, model_config_for_size

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    from weathermodel_tpu.cli.yield_main import build_parser as yp

    p = yp()
    # Reference cropnet_main.py defaults (cropnet_main.py:14-85): the
    # CropNet loop trains mini models over 3 past / 4 train years with a
    # 0.95 decay and k=3 mixture components.
    p.set_defaults(crop_type=None, n_train_years=4, n_past_years=3,
                   model_size="mini", decay_factor=0.95,
                   n_mixture_components=3)
    return p


def train_single_crop(crop_type: str, args) -> Tuple[float, float]:
    import jax

    from weathermodel_tpu.cli.yield_main import _model_table
    from weathermodel_tpu.data.cropnet_data import (
        CROPNET_TEST_YEAR,
        get_cropnet_train_test_arrays,
        read_cropnet_dataset,
        synthetic_cropnet_df,
    )
    from weathermodel_tpu.train.yield_trainer import YieldTrainer
    from weathermodel_tpu.utils import constants

    if getattr(args, "cropnet_df", None) is not None:
        df = args.cropnet_df
    elif args.country.lower() == "synthetic":
        df = synthetic_cropnet_df(seed=args.seed)
    else:
        df = read_cropnet_dataset(args.data_dir or constants.DATA_DIR)

    train_arr, test_arr, stats, n_past = get_cropnet_train_test_arrays(
        df, crop_type, args.n_train_years, CROPNET_TEST_YEAR,
        args.n_past_years,
    )

    k = args.n_mixture_components
    if args.model == "weatherformersinusoid" and k == 1:
        k = 4
    if args.model == "weatherformermixture" and k == 1:
        k = 7
    seq_len = (n_past + 1) * 52
    mcfg = model_config_for_size(args.model_size, k=k, max_len=seq_len,
                                 compute_dtype=args.compute_dtype)
    tcfg = TrainConfig(
        batch_size=args.batch_size, num_epochs=args.n_epochs,
        init_lr=args.init_lr, num_warmup_epochs=args.n_warmup_epochs,
        decay_factor=args.decay_factor, beta=args.beta,
        use_optimal_lr=args.use_optimal_lr, seed=args.seed,
    )
    model_cls, objective = _model_table()[args.model]
    if args.model == "linear":
        model = model_cls(mcfg, n_past_years=n_past, seq_len=seq_len)
    elif args.model == "cnnrnn":
        model = model_cls(weather_dim=mcfg.weather_dim, n_past_years=n_past)
    else:
        model = model_cls(mcfg, n_past_years=n_past,
                          attention_impl=args.attention_impl)

    pretrained = None
    if args.pretrained_model_path:
        from weathermodel_tpu.cli.pretrain import load_pretrained_params

        pretrained = load_pretrained_params(args.pretrained_model_path,
                                            mcfg.num_layers)

    trainer = YieldTrainer(
        model, mcfg, tcfg, objective, train_arr, test_arr, n_past,
        pretrained_encoder_params=pretrained,
        init_key=jax.random.PRNGKey(args.seed),
    )
    best_norm_rmse = trainer.train()
    rmse = best_norm_rmse * stats.std
    logger.info("%s: test RMSE %.3f (original units), normalized %.4f",
                crop_type, rmse, best_norm_rmse)
    return rmse, 0.0  # single fold -> std 0 (reference k=1)


def run(args) -> Dict[str, Optional[Tuple[float, float]]]:
    from weathermodel_tpu.data.cropnet_data import CROPNET_CROPS

    crops = [args.crop_type] if args.crop_type else list(CROPNET_CROPS)
    all_results: Dict[str, Optional[Tuple[float, float]]] = {}
    for crop in crops:
        try:
            logger.info("=" * 50)
            logger.info("Training %s", crop)
            all_results[crop] = train_single_crop(crop, args)
        except Exception as e:  # continue other crops (reference :236-238)
            logger.exception("Failed to train %s: %s", crop, e)
            all_results[crop] = None
    logger.info("=" * 60)
    logger.info("CROPNET TRAINING SUMMARY")
    for crop, result in all_results.items():
        if result is not None:
            logger.info("%s: RMSE = %.3f ± %.3f", crop, result[0], result[1])
        else:
            logger.info("%s: FAILED", crop)
    return all_results


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    args = build_parser().parse_args(argv)
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