#!/usr/bin/env python
"""Train an XPoint model from a YAML config (reference train.py CLI)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description='Train the XPoint-TPU network')
    parser.add_argument('-y', '--yaml-config', required=True,
                        help='YAML config file')
    parser.add_argument('-o', '--output-directory', default=None,
                        help='Override training.output_directory')
    parser.add_argument('-e', '--n-epochs', type=int, default=None)
    parser.add_argument('--max-steps', type=int, default=None,
                        help='Cap steps per epoch (debug)')
    parser.add_argument('--resume', action='store_true',
                        help='Resume from latest checkpoint in the output dir')
    parser.add_argument('-w', '--weight-file', default=None,
                        help='Checkpoint file (.ckpt orbax or reference '
                             '.model/.pth torch) to initialize the weights '
                             'from — the fine-tuning entry point (reference '
                             'train.py:21,75-84, strict=False semantics)')
    args = parser.parse_args()

    from xpoint_tpu.config import load_yaml
    from xpoint_tpu.trainer import Trainer

    config = load_yaml(args.yaml_config)
    out_dir = args.output_directory or config['training']['output_directory']

    trainer = Trainer(config, out_dir)
    if args.weight_file:
        trainer.load_weights(args.weight_file)
    if args.resume:
        epoch = trainer.resume()
        print(f"resumed from epoch {epoch}")
    trainer.train(n_epochs=args.n_epochs, max_steps_per_epoch=args.max_steps)


if __name__ == '__main__':
    main()
