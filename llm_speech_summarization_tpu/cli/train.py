"""Training CLI.

Flag parity with the reference entrypoint (reference: train.py:9-27):
  -c/--config   YAML config path
  -n/--name     run name (checkpoint/log subdirectory)
  -p/--checkpoint_path  resume checkpoint
The reference's -g/--gpu_idx is meaningless on TPU (devices come from the
mesh); superseded by --mesh "data,model" axis sizes.

Usage:  python -m llm_speech_summarization_tpu.cli.train -c <yaml> -n <name>
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="yaml file for configuration")
    parser.add_argument("-n", "--name", type=str, required=True,
                        help="name of the model for logging and saving checkpoints")
    parser.add_argument("-p", "--checkpoint_path", type=str, default=None,
                        help="path of checkpoint for resuming training")
    parser.add_argument("--mesh", type=str, default=None,
                        help="override mesh as 'data,model' or 'data,seq,model' (e.g. '4,2')")
    args = parser.parse_args(argv)

    from ..configs import load_config
    from ..parallel.mesh import distributed_init, make_mesh
    from ..train.trainer import Trainer

    # multi-host: join the cluster (env-driven; single-process no-op) BEFORE
    # the first backend touch so jax.devices() is the global set
    distributed_init()

    config = load_config(args.config)
    if args.mesh:
        try:
            sizes = [int(x) for x in args.mesh.split(",")]
        except ValueError:
            sizes = []
        if len(sizes) not in (2, 3):
            parser.error(
                f"--mesh must be 'data,model' or 'data,seq,model' ints, got {args.mesh!r}"
            )
        if len(sizes) == 3:
            config.train.mesh.data, config.train.mesh.seq, config.train.mesh.model = sizes
        else:
            config.train.mesh.data, config.train.mesh.model = sizes

    if config.debug.nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    if config.debug.disable_jit:
        import jax

        jax.config.update("jax_disable_jit", True)

    mesh = make_mesh(config)
    trainer = Trainer(config, run_name=args.name, checkpoint_path=args.checkpoint_path, mesh=mesh)
    trainer.train()


if __name__ == "__main__":
    main()
