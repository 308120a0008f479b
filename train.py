#!/usr/bin/env python3
"""Train one NAS-Bench-ASR architecture (reference-compatible CLI).

Usage (same 9-int arch vector + flags as the reference ``train.py:8-22``):

    python train.py 1 0 1 0 0 1 0 0 0 --batch_size 64 --epochs 40 \
        --data TIMIT --lr 1e-4 --dropout 0.2 --seed 1235

Extras over the reference: ``--data synthetic[:N]`` for the built-in fake
corpus, ``--dp/--tp`` for mesh parallelism, ``--decoder greedy|beam``.
"""

import argparse
import pathlib


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('model', type=int, nargs=9,
                        help='arch vector: 2 + 3 + 4 ints')
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--epochs', type=int, default=40)
    parser.add_argument('--data', type=str, default='TIMIT')
    parser.add_argument('--rnn', type=lambda s: s not in ('0', 'false', 'False'),
                        default=True)
    parser.add_argument('--exp_folder', type=str, default='results')
    parser.add_argument('--exp_name', type=str, default=None)
    parser.add_argument('--backend', type=str, default=None,
                        help='compatibility flag; only "jax" is valid')
    parser.add_argument('--lr', type=float, default=0.0001)
    parser.add_argument('--dropout', type=float, default=0.2)
    parser.add_argument('--gpus', type=int, nargs='+', default=None,
                        help='compatibility alias for --devices')
    parser.add_argument('--dp', type=int, default=None,
                        help='data-parallel mesh size (default: single device)')
    parser.add_argument('--tp', type=int, default=1,
                        help='tensor-parallel mesh size')
    parser.add_argument('--decoder', type=str, default='beam',
                        choices=['beam', 'greedy'])
    parser.add_argument('--init_scheme', type=str, default=None,
                        choices=['scaled', 'reference', 'he'],
                        help="kernel init (default: the model's 'scaled'; "
                             "'reference' = bit-faithful Keras/torch "
                             "glorot, which collapses the flagship in "
                             "bf16 — see models/asr.py)")
    parser.add_argument('--adam_eps', type=float, default=None,
                        help="Adam epsilon (default: the trainer's 1e-16; "
                             "pass 1e-7 for the reference optimizer)")
    parser.add_argument('--reset', action='store_true')
    parser.add_argument('--seed', type=int, default=1235)
    parser.add_argument('--platform', type=str, default=None,
                        help="force a jax platform (e.g. 'cpu'); default: auto")
    parser.add_argument('--dtype', type=str, default=None,
                        choices=['float32', 'bfloat16'],
                        help='encoder compute dtype; default: bfloat16 on '
                             'TPU (the fast native path, exactness-gated by '
                             'scripts/fused_parity_gate.py), float32 '
                             'elsewhere (reference-parity numerics)')
    parser.add_argument('--grouped_impl', type=str, default='auto',
                        choices=['auto', 'native', 'masked_dense', 'pallas',
                                 'pallas_split', 'chunked', 'fused',
                                 'fused_aligned'],
                        help='grouped-conv implementation for the cell ops '
                             "('auto' = fused_aligned Pallas cell on TPU, "
                             "chunked elsewhere)")
    parser.add_argument('--matmul_precision', type=str, default=None,
                        choices=['default', 'high', 'highest'],
                        help='XLA dot/conv precision for f32 operands; '
                             'defaults to "highest" for --dtype float32 '
                             '(reference-parity numerics: the TPU MXU and '
                             'the XLA CPU conv otherwise use reduced-'
                             'precision passes) and "default" for bfloat16')
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    if args.dtype is None:
        import jax
        try:
            on_tpu = jax.devices()[0].platform == 'tpu'
        except Exception:
            on_tpu = False
        args.dtype = 'bfloat16' if on_tpu else 'float32'

    precision = args.matmul_precision or (
        'highest' if args.dtype == 'float32' else 'default')
    if precision != 'default':
        import jax
        jax.config.update('jax_default_matmul_precision', precision)

    import nbasr_tpu
    from nbasr_tpu.training import get_dataloaders, get_loss

    arch = [args.model[0:2], args.model[2:5], args.model[5:9]]
    if not args.exp_name:
        flat = '_'.join(map(str, args.model))
        args.exp_name = f'{flat}_b{args.batch_size}_rnn{int(args.rnn)}'

    nbasr_tpu.set_default_backend(args.backend)
    nbasr_tpu.set_seed(args.seed)

    print(f'Using backend: {nbasr_tpu.get_backend_name()}')
    print(f'    Model vec: {arch}')
    print(f'    Training for {args.epochs} epochs, batch {args.batch_size}, '
          f'lr {args.lr}, dropout {args.dropout}')

    results_folder = pathlib.Path(args.exp_folder) / 'jax'
    dataloaders = get_dataloaders(args.data, batch_size=args.batch_size)
    loss = get_loss()
    import jax.numpy as jnp
    model_kw = {}
    if args.init_scheme:
        model_kw['init_scheme'] = args.init_scheme
    model = nbasr_tpu.get_model(
        arch, use_rnn=args.rnn, dropout_rate=args.dropout, data_norm=True,
        compute_dtype=jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32,
        grouped_impl=args.grouped_impl, **model_kw)

    trainer_kw = {}
    if args.adam_eps is not None:
        trainer_kw['adam_eps'] = args.adam_eps
    if args.dp or args.tp > 1:
        from nbasr_tpu.parallel import ParallelTrainer, make_mesh
        trainer = ParallelTrainer(dataloaders, loss,
                                  mesh=make_mesh(dp=args.dp, tp=args.tp),
                                  save_dir=results_folder,
                                  eval_decoder=args.decoder, **trainer_kw)
    else:
        trainer = nbasr_tpu.get_trainer(dataloaders, loss,
                                        save_dir=results_folder,
                                        eval_decoder=args.decoder,
                                        **trainer_kw)
    trainer.train(model, epochs=args.epochs, lr=args.lr, reset=args.reset,
                  model_name=args.exp_name, seed=args.seed)


if __name__ == '__main__':
    main()
