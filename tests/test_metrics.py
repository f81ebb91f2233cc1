"""Metrics tests: AUC against an exact pairwise reference, GAUC against a
brute-force per-group computation (parity with reference metrics tests)."""

import jax
import jax.numpy as jnp
import numpy as np

import hybridbackend_tpu.metrics as hbm


def exact_auc(labels, preds):
  """Exact pairwise ROC AUC (ties counted 0.5)."""
  pos = preds[labels > 0]
  neg = preds[labels <= 0]
  if len(pos) == 0 or len(neg) == 0:
    return float('nan')
  greater = (pos[:, None] > neg[None, :]).sum()
  equal = (pos[:, None] == neg[None, :]).sum()
  return (greater + 0.5 * equal) / (len(pos) * len(neg))


class TestAUC:

  def test_close_to_exact(self):
    rng = np.random.RandomState(0)
    n = 2000
    labels = rng.randint(0, 2, n).astype(np.float32)
    preds = np.clip(labels * 0.3 + rng.rand(n) * 0.7, 0, 1).astype(
        np.float32)
    state = hbm.auc_init(200)
    state = hbm.auc_update(state, jnp.asarray(labels), jnp.asarray(preds))
    got = float(hbm.auc_result(state))
    want = exact_auc(labels, preds)
    assert abs(got - want) < 0.01

  def test_streaming_equals_single_batch(self):
    rng = np.random.RandomState(1)
    labels = rng.randint(0, 2, 512).astype(np.float32)
    preds = rng.rand(512).astype(np.float32)
    s1 = hbm.auc_update(hbm.auc_init(), jnp.asarray(labels),
                        jnp.asarray(preds))
    s2 = hbm.auc_init()
    for i in range(0, 512, 128):
      s2 = hbm.auc_update(s2, jnp.asarray(labels[i:i + 128]),
                          jnp.asarray(preds[i:i + 128]))
    assert abs(float(hbm.auc_result(s1)) - float(hbm.auc_result(s2))) < 1e-6

  def test_perfect_classifier(self):
    labels = jnp.asarray([0, 0, 1, 1], jnp.float32)
    preds = jnp.asarray([0.1, 0.2, 0.8, 0.9], jnp.float32)
    state = hbm.auc_update(hbm.auc_init(), labels, preds)
    assert float(hbm.auc_result(state)) > 0.99

  def test_weights(self):
    labels = jnp.asarray([0, 1], jnp.float32)
    preds = jnp.asarray([0.4, 0.6], jnp.float32)
    w = jnp.asarray([2.0, 3.0])
    state = hbm.auc_update(hbm.auc_init(), labels, preds, weights=w)
    assert float(state.tp.max()) == 3.0
    assert float(state.tn.max()) == 2.0

  def test_under_jit_sharded(self):
    # Metrics on globally-sharded arrays under jit — the distributed path.
    from hybridbackend_tpu.framework.context import Context
    ctx = Context.get()
    rng = np.random.RandomState(2)
    labels = rng.randint(0, 2, 256).astype(np.float32)
    preds = rng.rand(256).astype(np.float32)
    dl = jax.device_put(jnp.asarray(labels), ctx.batch_sharding)
    dp = jax.device_put(jnp.asarray(preds), ctx.batch_sharding)
    f = jax.jit(lambda s, l, p: hbm.auc_update(s, l, p))
    got = float(hbm.auc_result(f(hbm.auc_init(), dl, dp)))
    want = float(hbm.auc_result(hbm.auc_update(
        hbm.auc_init(), jnp.asarray(labels), jnp.asarray(preds))))
    assert abs(got - want) < 1e-6


def brute_force_gauc(labels, preds, groups, skip_boundary=True):
  """Direct port of the reference kernel semantics for testing."""
  total_w = 0.0
  total = 0.0
  uniq = []
  for g in groups:
    if not uniq or uniq[-1] != g:
      uniq.append(g)
  for i, g in enumerate(uniq):
    if skip_boundary and (i == 0 or i == len(uniq) - 1):
      continue
    sel = np.asarray(groups) == g
    l, p = labels[sel], preds[sel]
    order = np.argsort(p, kind='stable')
    l = l[order]
    fp1 = tp1 = fp2 = tp2 = 0.0
    acc = 0.0
    for k in range(len(l)):
      fp2 += 1 - l[k]
      tp2 += l[k]
      acc += (fp2 - fp1) * (tp2 + tp1)
      fp1, tp1 = fp2, tp2
    thresh = len(l) - 1e-3
    if tp2 > thresh or fp2 > thresh:
      continue
    if tp2 * fp2 > 0:
      total += (1.0 - acc / (2 * tp2 * fp2)) * len(l)
      total_w += len(l)
  return total / total_w if total_w else 0.0


class TestGAUC:

  def test_matches_brute_force(self):
    rng = np.random.RandomState(3)
    groups = np.sort(rng.randint(0, 20, 400))
    labels = rng.randint(0, 2, 400).astype(np.float32)
    preds = rng.rand(400).astype(np.float32)
    num, den = hbm.gauc_batch(jnp.asarray(labels), jnp.asarray(preds),
                              jnp.asarray(groups))
    got = float(num) / float(den)
    want = brute_force_gauc(labels, preds, groups)
    assert abs(got - want) < 1e-5

  def test_all_same_label_groups_skipped(self):
    groups = np.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    labels = np.asarray([1, 1, 1, 1, 0, 0, 0, 1], np.float32)
    preds = np.asarray([.1, .9, .2, .8, .3, .7, .4, .6], np.float32)
    # interior groups 1 (all-pos) and 2 (all-neg) are invalid → den == 0
    num, den = hbm.gauc_batch(jnp.asarray(labels), jnp.asarray(preds),
                              jnp.asarray(groups))
    assert float(den) == 0.0

  def test_without_boundary_skip(self):
    groups = np.asarray([0, 0, 0, 0])
    labels = np.asarray([0, 1, 0, 1], np.float32)
    preds = np.asarray([.1, .9, .2, .8], np.float32)
    num, den = hbm.gauc_batch(jnp.asarray(labels), jnp.asarray(preds),
                              jnp.asarray(groups),
                              skip_boundary_groups=False)
    assert float(den) == 4.0
    assert abs(float(num) / float(den) - 1.0) < 1e-6  # perfect ranking

  def test_streaming(self):
    rng = np.random.RandomState(4)
    state = hbm.gauc_init()
    for _ in range(3):
      groups = np.sort(rng.randint(0, 10, 100))
      labels = rng.randint(0, 2, 100).astype(np.float32)
      preds = rng.rand(100).astype(np.float32)
      state = hbm.gauc_update(state, jnp.asarray(labels),
                              jnp.asarray(preds), jnp.asarray(groups))
    assert 0.0 <= float(hbm.gauc_result(state)) <= 1.0


class TestMeanAccuracy:

  def test_mean(self):
    s = hbm.mean_update(hbm.mean_init(), jnp.asarray([1.0, 2.0, 3.0]))
    assert abs(float(hbm.mean_result(s)) - 2.0) < 1e-6

  def test_weighted_mean(self):
    s = hbm.mean_update(hbm.mean_init(), jnp.asarray([1.0, 3.0]),
                        jnp.asarray([3.0, 1.0]))
    assert abs(float(hbm.mean_result(s)) - 1.5) < 1e-6

  def test_accuracy(self):
    s = hbm.accuracy_update(hbm.accuracy_init(),
                            jnp.asarray([1, 0, 1, 1]),
                            jnp.asarray([1, 0, 0, 1]))
    assert abs(float(hbm.accuracy_result(s)) - 0.75) < 1e-6


class TestGAUCSorted:

  def test_sorted_matches_contiguous(self):
    rng = np.random.RandomState(7)
    groups = np.sort(rng.randint(0, 15, 300))
    labels = rng.randint(0, 2, 300).astype(np.float32)
    preds = rng.rand(300).astype(np.float32)
    # contiguous, no boundary skip
    n1, d1 = hbm.gauc_batch(jnp.asarray(labels), jnp.asarray(preds),
                            jnp.asarray(groups),
                            skip_boundary_groups=False)
    # shuffled input + sort_groups=True must give the same result
    perm = rng.permutation(300)
    n2, d2 = hbm.gauc_batch(jnp.asarray(labels[perm]),
                            jnp.asarray(preds[perm]),
                            jnp.asarray(groups[perm]), sort_groups=True)
    assert abs(float(n1) - float(n2)) < 1e-3
    assert float(d1) == float(d2)

  def test_shuffled_without_sort_is_degenerate(self):
    rng = np.random.RandomState(8)
    groups = rng.randint(0, 15, 300)  # NOT sorted
    labels = rng.randint(0, 2, 300).astype(np.float32)
    preds = rng.rand(300).astype(np.float32)
    _, den = hbm.gauc_batch(jnp.asarray(labels), jnp.asarray(preds),
                            jnp.asarray(groups))
    assert float(den) < 300  # mostly singleton runs → few valid groups
