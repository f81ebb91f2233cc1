"""Criteo TSV -> Parquet converter (real-dataset schema compatibility).

The Criteo 1TB click-logs format (ailab.criteo.com) is headerless TSV:
``label \t 13 integer features \t 26 categorical features`` where the
integer features may be empty or negative and the categoricals are
8-hex-digit strings (or empty). The reference prepares it with
``docs/tutorial/ranking/criteo/data/prep.py`` (int32 label/ints, int64
hex-decoded cats, nulls -> -65536); this converter targets the SAME
source files but emits the schema ``examples/criteo/train.py``
consumes directly:

  * ``label``  float32 0/1
  * ``i0..i12`` float32 — ``log1p(max(x, 0))`` (the standard Criteo
    dense transform; ``--raw-dense`` keeps raw values)
  * ``c0..c25`` int32 in ``[0, vocab)`` — ``int(hex, 16) % vocab``
    (int64 when ``vocab`` exceeds int32); missing values become ``-1``
    (the lookup validity contract maps them to zero vectors, so no
    table row is wasted on "missing"). int32 + plain encoding halve
    the decode bytes of the hot categorical columns — hash-modded ids
    are high-cardinality, where dictionary pages cost more to decode
    than they save (measured: the training-side reader decodes
    high-card dictionary int64 2-3x slower than plain int32)

Usage:
  python examples/criteo/convert.py day_0 [day_1 ...] \
      [--vocab 100000] [--out-dir DIR] [--rows-per-chunk 1000000]
  python examples/criteo/train.py --data 'day_0.parquet' ...
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import argparse
import os

import numpy as np

NUM_DENSE = 13
NUM_CAT = 26
COLUMNS = (['label'] + [f'rawint{i}' for i in range(NUM_DENSE)]
           + [f'rawcat{i}' for i in range(NUM_CAT)])


def _hex_decode_fixed8(vals: np.ndarray) -> np.ndarray:
  """Vectorized decode of 8-hex-digit strings: bytes view -> nibbles ->
  base-16 accumulate (no per-value Python int(x, 16) — a real Criteo
  day is ~5e9 values, where the interpreter loop alone costs hours)."""
  b = vals.astype('S8').view(np.uint8).reshape(len(vals), 8)
  nib = np.where(b >= ord('a'), b - ord('a') + 10,
                 np.where(b >= ord('A'), b - ord('A') + 10,
                          b - ord('0'))).astype(np.int64)
  out = np.zeros(len(vals), np.int64)
  for k in range(8):
    out = (out << 4) | nib[:, k]
  return out


def _hex_to_id(col, vocab: int) -> np.ndarray:
  """``int(x, 16) % vocab`` with empty/NaN -> -1; the fixed-width
  8-hex-digit case (the Criteo format) decodes fully vectorized."""
  out = np.full(len(col), -1, np.int64)
  mask = (col.notna() & (col != '')).to_numpy()  # '' only in fixtures;
                                                 # read_csv gives NaN
  vals = col[mask].astype(str).to_numpy()
  if len(vals):
    lens = np.char.str_len(vals.astype(np.str_))
    if (lens == 8).all():
      out[mask] = _hex_decode_fixed8(vals) % vocab
    else:   # tolerate nonstandard widths (fixtures, truncated rows)
      out[mask] = np.asarray(
          [int(v, 16) for v in vals], np.int64) % vocab
  return out


def convert_chunk(df, vocab: int, log_norm: bool = True):
  """One pandas chunk (reference-format columns) -> train.py schema."""
  out = {}
  lab = df['label'].fillna(0).to_numpy()
  out['label'] = lab.astype(np.float32)
  for i in range(NUM_DENSE):
    v = df[f'rawint{i}'].fillna(0).to_numpy().astype(np.float32)
    out[f'i{i}'] = np.log1p(np.maximum(v, 0.0)) if log_norm else v
  cat_dtype = np.int32 if vocab <= (1 << 31) - 1 else np.int64
  for c in range(NUM_CAT):
    out[f'c{c}'] = _hex_to_id(df[f'rawcat{c}'], vocab).astype(cat_dtype)
  return out


def convert(tsv_path: str, out_path: str, vocab: int = 100_000,
            rows_per_chunk: int = 1_000_000, log_norm: bool = True,
            compression: str = 'snappy') -> int:
  import pandas as pd
  import pyarrow as pa
  import pyarrow.parquet as pq
  writer = None
  total = 0
  for df in pd.read_csv(tsv_path, sep='\t', names=COLUMNS,
                        header=None, chunksize=rows_per_chunk,
                        dtype={f'rawcat{c}': str for c in range(NUM_CAT)}):
    tbl = pa.table(convert_chunk(df, vocab, log_norm))
    if writer is None:
      # Hash-modded categorical ids are high-cardinality: dictionary
      # pages decode SLOWER than plain for them (big dict gathers);
      # keep dictionary encoding for the low-card dense/label columns.
      writer = pq.ParquetWriter(
          out_path, tbl.schema, compression=compression,
          use_dictionary=[f'i{i}' for i in range(NUM_DENSE)] + ['label'])
    writer.write_table(tbl, row_group_size=min(rows_per_chunk, 65536))
    total += len(df)
  if writer is None:
    raise SystemExit(f'{tsv_path}: no rows')
  writer.close()
  return total


def main():
  p = argparse.ArgumentParser()
  p.add_argument('files', nargs='+', help='Criteo TSV day files')
  p.add_argument('--vocab', type=int, default=100_000,
                 help='hash-mod vocabulary per categorical column '
                      '(match train.py --vocab)')
  p.add_argument('--out-dir', default='',
                 help='output directory (default: alongside input)')
  p.add_argument('--rows-per-chunk', type=int, default=1_000_000)
  p.add_argument('--raw-dense', action='store_true',
                 help='keep raw integer features (no log1p)')
  p.add_argument('--compression', default='snappy')
  args = p.parse_args()
  for f in args.files:
    base = os.path.basename(f)
    stem = base[:-4] if base.endswith('.tsv') else base
    out = os.path.join(args.out_dir or os.path.dirname(f) or '.',
                       stem + '.parquet')
    n = convert(f, out, vocab=args.vocab,
                rows_per_chunk=args.rows_per_chunk,
                log_norm=not args.raw_dense,
                compression=args.compression)
    print(f'{f} -> {out}: {n} rows')


if __name__ == '__main__':
  main()
