"""Phase breakdown of the flagship sparse train step (one chip).

The flagship measures ~12.3 ms end-to-end; the update path alone probes
at ~6.2 ms (update_path_probe). This probe isolates the REST:

  lookup    fx.lookup_raw only (packed-table gathers + combine inputs)
  fwd       lookup + tower forward (loss value)
  fwdbwd    lookup + tower forward+backward (grads consumed as scalars)
  nosparse  full step minus the table update (dense adam still applied)
  full      make_sparse_train_step (reference point)

Timing: axon-safe (lax.scan inside jit, carry-dependent ids, scalar
readback). Usage: python benchmarks/step_phase_probe.py [--cases ...]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import time


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--inner', type=int, default=10)
  p.add_argument('--repeats', type=int, default=2)
  p.add_argument('--batch', type=int, default=8192)
  p.add_argument('--tables', type=int, default=26)
  p.add_argument('--dim', type=int, default=16)
  p.add_argument('--vocab', type=int, default=100_000)
  p.add_argument('--cases', nargs='*', default=None)
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax
  import hybridbackend_tpu as hb
  from hybridbackend_tpu.embedding import TableConfig
  from hybridbackend_tpu.models import (
      EmbeddingSpec, StackedFeatureExtractor, stacked_dcn_v2_apply,
      stacked_dcn_v2_init)
  from hybridbackend_tpu.training import (
      SparseTrainState, make_sparse_train_step)

  ctx = hb.Context.get()
  specs = [EmbeddingSpec(TableConfig(f'c{i}', args.vocab, args.dim))
           for i in range(args.tables)]
  dense_names = [f'i{d}' for d in range(13)]
  key = jax.random.PRNGKey(0)
  k_tab, k_net = jax.random.split(key)
  net = stacked_dcn_v2_init(
      k_net, [args.dim] * args.tables + [1] * 13, [1024, 512, 256, 1])
  fx = StackedFeatureExtractor(specs, dense_columns=dense_names, ctx=ctx)
  tables = fx.init(k_tab)

  rng = np.random.RandomState(0)
  B = args.batch
  base = {f'c{i}': jnp.asarray(
      rng.randint(0, args.vocab, B), jnp.int32)
      for i in range(args.tables)}
  for d in dense_names:
    base[d] = jnp.asarray(rng.randn(B).astype(np.float32))
  base['label'] = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))

  def batch_at(i):
    b = dict(base)
    for k in list(b):
      if k.startswith('c'):
        b[k] = (b[k] + i.astype(jnp.int32)) % args.vocab
    return b

  def bce(preds, y):
    preds = jnp.clip(preds, 1e-6, 1 - 1e-6)
    return -jnp.mean(y * jnp.log(preds) + (1 - y) * jnp.log(1 - preds))

  def model_loss(dense_params, emb_f, dense_f, batch):
    return bce(stacked_dcn_v2_apply(dense_params, emb_f + dense_f),
               batch['label']), {}

  state = SparseTrainState.create(net, tables, optax.adam(1e-3),
                                  adagrad_init=0.1, ctx=ctx)

  def loss_from(dense, raw, layouts, batch):
    emb_f, dense_f = fx.combine_from_raw(raw, layouts, batch)
    return model_loss(dense, emb_f, dense_f, batch)

  cases = {}

  def lookup_body(carry, _):
    s, i = carry
    raw, ids_by_stack, layouts = fx.lookup_raw(state.tables, batch_at(i))
    out = sum(jnp.sum(r[0, 0]) for r in raw.values())
    out = out + sum(v[0, 0].astype(jnp.float32)
                    for v in ids_by_stack.values())
    return (s + out, i + 1), ()

  cases['lookup'] = lookup_body

  def fwd_body(carry, _):
    s, i = carry
    batch = batch_at(i)
    raw, _ids, layouts = fx.lookup_raw(state.tables, batch)
    loss, _ = loss_from(state.dense, raw, layouts, batch)
    return (s + loss, i + 1), ()

  cases['fwd'] = fwd_body

  def fwdbwd_body(carry, _):
    s, i = carry
    batch = batch_at(i)
    raw, _ids, layouts = fx.lookup_raw(state.tables, batch)
    raw = jax.tree_util.tree_map(jax.lax.stop_gradient, raw)
    (loss, _), (dg, dr) = jax.value_and_grad(
        lambda d, r: loss_from(d, r, layouts, batch),
        argnums=(0, 1), has_aux=True)(state.dense, raw)
    out = loss + sum(jnp.sum(x[0, 0]) for x in jax.tree_util.tree_leaves(dr))
    out = out + jax.tree_util.tree_leaves(dg)[0].reshape(-1)[0]
    return (s + out, i + 1), ()

  cases['fwdbwd'] = fwdbwd_body

  def nosparse_body(carry, _):
    dense, opt_state, i = carry
    batch = batch_at(i)
    raw, _ids, layouts = fx.lookup_raw(state.tables, batch)
    raw = jax.tree_util.tree_map(jax.lax.stop_gradient, raw)
    opt = optax.adam(1e-3)
    (loss, _), dg = jax.value_and_grad(
        lambda d: loss_from(d, raw, layouts, batch), has_aux=True)(dense)
    updates, opt_state = opt.update(dg, opt_state, dense)
    dense = optax.apply_updates(dense, updates)
    return (dense, opt_state, i + 1), ()

  cases['nosparse'] = nosparse_body

  step = make_sparse_train_step(fx, model_loss, optax.adam(1e-3),
                                table_lr=0.05, ctx=ctx,
                                donate_state=False)

  def full_body(carry, _):
    st, i = carry
    st, metrics = step(st, batch_at(i))
    return (st, i + 1), ()

  results = []
  for name in (args.cases or ['lookup', 'fwd', 'fwdbwd', 'nosparse',
                              'full']):
    if name == 'full':
      carry0 = (state, jnp.float32(0.0))
      body = full_body
      read = lambda c: c[0].dense['mlp'][0]['w'].reshape(-1)[0] \
          if isinstance(c[0].dense, dict) else \
          jax.tree_util.tree_leaves(c[0].dense)[0].reshape(-1)[0]
    elif name == 'nosparse':
      opt0 = optax.adam(1e-3).init(state.dense)
      carry0 = (state.dense, opt0, jnp.float32(0.0))
      body = cases[name]
      read = lambda c: jax.tree_util.tree_leaves(c[0])[0].reshape(-1)[0]
    else:
      carry0 = (jnp.float32(0.0), jnp.float32(0.0))
      body = cases[name]
      read = lambda c: c[0]

    @jax.jit
    def run(c0, body=body, read=read):
      c, _ = jax.lax.scan(body, c0, None, length=args.inner)
      return read(c)

    try:
      t0 = time.time()
      float(run(carry0))
      compile_s = time.time() - t0
      times = []
      for _ in range(args.repeats):
        t0 = time.time()
        float(run(carry0))
        times.append((time.time() - t0) / args.inner)
      ms = 1000.0 * min(times)
      r = {'case': name, 'ms': round(ms, 3),
           'compile_s': round(compile_s, 1)}
      results.append(r)
      print(r, file=_sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue
      results.append({'case': name, 'error': str(e)[:300]})
      print(f'{name}: ERROR {e}', file=_sys.stderr, flush=True)

  print(json.dumps(results))


if __name__ == '__main__':
  main()
