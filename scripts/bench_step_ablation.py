"""Ablate the pallas_split train step: encoder fwd, encoder fwd+bwd,
full model fwd+bwd, full train step — find where the 84 ms goes."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.models import get_model

ARCH = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]
IMPL = sys.argv[1] if len(sys.argv) > 1 else 'pallas_split'
TRAIN = '--train' in sys.argv  # dropout active


from _timing import timed  # noqa: E402


def main():
    model = get_model(ARCH, use_rnn=True, dropout_rate=0.2, data_norm=True,
                      compute_dtype=jnp.bfloat16, grouped_impl=IMPL)
    B, T = 32, 470
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, 80), jnp.float32)
    sizes = jnp.full((B,), T, jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats, sizes)
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}
    rngs = {'dropout': jax.random.PRNGKey(1)} if TRAIN else None

    def enc(p, f, s):
        return model.apply({'params': p, **rest}, f, s, stage='encode',
                           train=TRAIN, rngs=rngs)

    def full(p, f, s):
        return model.apply({'params': p, **rest}, f, s, train=TRAIN,
                           rngs=rngs)

    enc_j = jax.jit(enc)
    full_j = jax.jit(full)
    print(f'impl={IMPL} train(dropout)={TRAIN}')
    print(f'encoder fwd:      {timed(enc_j, params, feats, sizes):7.2f} ms')
    print(f'full fwd:         {timed(full_j, params, feats, sizes):7.2f} ms')

    def enc_loss(p):
        return (enc(p, feats, sizes).astype(jnp.float32) ** 2).mean()

    def full_loss(p):
        return (full(p, feats, sizes) ** 2).mean()

    ge = jax.jit(jax.grad(enc_loss))
    gf = jax.jit(jax.grad(full_loss))
    print(f'encoder fwd+bwd:  {timed(ge, params):7.2f} ms')
    print(f'full fwd+bwd:     {timed(gf, params):7.2f} ms')


if __name__ == '__main__':
    main()
