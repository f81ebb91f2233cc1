"""Tests for TensorBoard summary output (reference parity: Policy/
EvaluationHook summary writes, ``training/hooks.py:36-160``)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridbackend_tpu.utils.summary import (
    SummaryWriter, crc32c, read_event_scalars)


class TestWriterFormat:

  def test_crc32c_known_vectors(self):
    # RFC 3720 / kernel test vectors.
    assert crc32c(b'') == 0
    assert crc32c(b'a') == 0xC1D04330
    assert crc32c(b'123456789') == 0xE3069283

  def test_roundtrip(self, tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalar('loss', 0.5, step=1)
    w.scalars(2, {'loss': 0.25, 'auc': 0.75})
    w.close()
    got = read_event_scalars(w.path)
    assert (1, 'loss', 0.5) in got
    assert (2, 'loss', 0.25) in got
    assert (2, 'auc', 0.75) in got

  def test_tensorboard_can_read_it(self, tmp_path):
    """The real TensorBoard loader must parse our hand-encoded records
    — this validates framing CRCs and proto field numbers for real."""
    tb = pytest.importorskip('tensorboard.backend.event_processing'
                             '.event_file_loader')
    w = SummaryWriter(str(tmp_path))
    w.scalar('train/loss', 0.125, step=7)
    w.scalars(8, {'eval/auc': 0.625})
    w.close()
    events = list(tb.EventFileLoader(w.path).Load())
    assert events[0].file_version == 'brain.Event:2'
    scalars = {}
    for e in events[1:]:
      for v in e.summary.value:
        # Newer loaders data-compat-migrate simple_value into a tensor.
        if v.WhichOneof('value') == 'tensor':
          scalars[(e.step, v.tag)] = v.tensor.float_val[0]
        else:
          scalars[(e.step, v.tag)] = v.simple_value
    assert scalars[(7, 'train/loss')] == 0.125
    assert scalars[(8, 'eval/auc')] == 0.625


class TestTrainerSummaries:

  def test_train_and_eval_write_events(self, tmp_path):
    from hybridbackend_tpu.estimator import Trainer
    import hybridbackend_tpu as hb

    w0 = jnp.asarray([0.5, -0.5], jnp.float32)

    def loss_fn(p, b):
      preds = jax.nn.sigmoid(b['x'] @ p)
      pc = jnp.clip(preds, 1e-6, 1 - 1e-6)
      pel = -(b['label'] * jnp.log(pc)
              + (1 - b['label']) * jnp.log(1 - pc))
      return jnp.mean(pel), {'preds': preds, 'per_example_loss': pel}

    rng = np.random.RandomState(0)

    def batches(n):
      for _ in range(n):
        x = rng.rand(16, 2).astype(np.float32)
        yield {'x': x, 'label': (x.sum(1) > 1).astype(np.float32)}

    model_dir = str(tmp_path / 'model')
    with hb.scope(summary_steps=2):
      tr = Trainer(loss_fn, w0, model_dir=model_dir)
      tr.train(batches(6), sync=False)
      tr.evaluate(batches(2))
    tr._summary.close()
    files = glob.glob(os.path.join(model_dir, 'events.out.tfevents.*'))
    assert len(files) == 1, files
    got = read_event_scalars(files[0])
    tags = {t for _, t, _ in got}
    assert 'train/loss' in tags
    assert 'eval/auc' in tags and 'eval/loss' in tags
    train_steps = [s for s, t, _ in got if t == 'train/loss']
    assert train_steps == [2, 4, 6], train_steps
