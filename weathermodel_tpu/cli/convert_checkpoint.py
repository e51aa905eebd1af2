"""Convert a reference (torch) WeatherBERT/WeatherFormer checkpoint to an
orbax params directory usable with --pretrained-model-path.

Usage: wm-convert-checkpoint --torch-path weatherformer_2.0m_latest.pth \
           --num-layers 4 --out checkpoints/converted/wf_small
"""

import argparse
import logging

logger = logging.getLogger(__name__)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch-path", required=True)
    p.add_argument("--num-layers", required=True, type=int,
                   help="transformer depth of the checkpointed model "
                        "(mini 2 / small 4 / medium 6 / large 8)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    from weathermodel_tpu.models.transfer import convert_torch_checkpoint

    params = convert_torch_checkpoint(args.torch_path, args.num_layers)
    ckptr = ocp.StandardCheckpointer()
    import os

    ckptr.save(os.path.abspath(args.out), params)
    ckptr.wait_until_finished()
    logger.info("converted %s -> %s", args.torch_path, args.out)


if __name__ == "__main__":
    main()
