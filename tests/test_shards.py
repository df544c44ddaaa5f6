"""Tokenized-training-corpus sink (operators/shards.py): round-trip,
determinism across input partitionings, the BPE-composed path, and the
dense-position writer guard."""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.functions.text import hash60
from wrf_to_geodataframe_spark.operators.shards import (
    write_token_shards,
    write_training_corpus,
)

SEED = "t"
S = 64  # small shard size so a tiny corpus spans many shards


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _corpus(n_docs: int = 60):
    rows = []
    for i in range(n_docs):
        words = [f"w{(i * 7 + j * 3) % 41}" for j in range(5 + i % 9)]
        rows.append((i, " ".join(words)))
    return rows


def _replay_stream(rows) -> list[int]:
    """Driver-side replay: seeded permutation, docs end-to-end, token
    ids = hash60 of the whitespace words — the exact byte stream the
    shards must contain, computed with hashlib alone."""
    order = sorted(rows, key=lambda r: (_h60(f"{SEED}:{r[0]}"), r[0]))
    stream = []
    for _i, text in order:
        stream += [_h60(w) for w in text.split(" ")]
    return stream


def _doc_tokens(spark, rows, parts=4):
    return (
        spark.createDataFrame(rows, "doc_id long, text string")
        .repartition(parts)
        .select(
            "doc_id",
            F.transform(
                F.split("text", " "), lambda w: hash60(w)
            ).alias("toks"),
        )
    )


def _read_all(out_dir) -> tuple[list[int], list[np.ndarray]]:
    files = sorted(glob.glob(os.path.join(out_dir, "shard_*.npy")))
    arrs = [np.load(f) for f in files]
    return [int(x) for a in arrs for x in a], arrs


def test_shards_round_trip_against_hashlib_replay(spark, tmp_path):
    rows = _corpus()
    out = str(tmp_path / "shards")
    os.makedirs(out)
    man = write_training_corpus(
        _doc_tokens(spark, rows), out, SEED, shard_tokens=S
    ).collect()

    stream = _replay_stream(rows)
    got, arrs = _read_all(out)
    assert got == stream
    # every shard full except the last; ids contiguous from 0
    assert sorted(r.shard_id for r in man) == list(range(len(arrs)))
    sizes = [len(a) for a in arrs]
    assert all(s == S for s in sizes[:-1]) and 0 < sizes[-1] <= S
    # manifest checksums equal the hashlib replay's
    for r in sorted(man, key=lambda r: r.shard_id):
        chunk = stream[r.shard_id * S:(r.shard_id + 1) * S]
        want = sum((p + 1) * (t % (1 << 20)) for p, t in enumerate(chunk))
        assert (r.n_tokens, r.checksum) == (len(chunk), want)


def test_shards_identical_across_input_partitionings(spark, tmp_path):
    rows = _corpus()
    outs, manifests, bytes_ = [], [], []
    for tag, parts in (("a", 2), ("b", 17)):
        out = str(tmp_path / tag)
        os.makedirs(out)
        man = write_training_corpus(
            _doc_tokens(spark, rows, parts), out, SEED, shard_tokens=S
        ).collect()
        manifests.append(sorted(map(tuple, man)))
        files = sorted(glob.glob(os.path.join(out, "shard_*.npy")))
        bytes_.append([open(f, "rb").read() for f in files])
        outs.append(out)
    assert manifests[0] == manifests[1]
    assert bytes_[0] == bytes_[1]


def test_shards_compose_with_bpe_encode(spark, tmp_path):
    """The full terminal-stage composition: BPE-encode the documents
    table, hash the merged tokens to ids, shard them — the re-read
    stream must equal the seeded concatenation of the per-doc encoded
    token lists (collected independently of the sink)."""
    from wrf_to_geodataframe_spark.session import load_table
    from wrf_to_geodataframe_spark.suite.pipeline import (
        _bpe_apply_doc_expr_spark,
        _bpe_train_merges,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    merges = [(m[1], m[2]) for m in _bpe_train_merges(docs)]
    enc = F.expr(
        f"filter(split({_bpe_apply_doc_expr_spark(merges)}, '[ |]'), "
        "t -> t != '')"
    )
    doc_toks = docs.select(
        "doc_id",
        F.transform(enc, lambda t: hash60(t)).alias("toks"),
    )
    out = str(tmp_path / "bpe_shards")
    os.makedirs(out)
    write_training_corpus(doc_toks, out, SEED, shard_tokens=S).collect()

    per_doc = {
        r.doc_id: list(r.toks) for r in doc_toks.collect()
    }
    order = sorted(per_doc, key=lambda i: (_h60(f"{SEED}:{i}"), i))
    want = [t for i in order for t in per_doc[i]]
    got, _ = _read_all(out)
    assert got == want


def test_writer_rejects_non_dense_positions(spark, tmp_path):
    rows = [(0, 0, 11), (0, 2, 22)]  # position 1 missing
    df = spark.createDataFrame(
        rows, "shard_id long, pos_in_shard long, tok long"
    )
    with pytest.raises(Exception, match="not dense"):
        write_token_shards(df, str(tmp_path), shard_tokens=4).collect()


def test_shard_plan_no_cartesian_no_unpartitioned_data_window(spark):
    """Plan pin: the sink's running sums window WITHIN hash buckets
    (every window over doc rows carries a partition spec; the only
    unpartitioned window is the B-row bucket-offset cumsum, which
    plans below an aggregate), and nothing is a cartesian."""
    from wrf_to_geodataframe_spark.suite.pipeline import QUERIES

    df = QUERIES["train_shard_manifest"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    win_lines = [
        ln for ln in plan.splitlines()
        if ln.strip().startswith(("Window", "+- Window", ":- Window"))
        or " Window [" in ln
    ]
    assert win_lines, plan
    unpartitioned = [ln for ln in win_lines if ln.count("], [") < 2]
    # exactly the bounded bucket-offset cumsum may be unpartitioned
    assert len(unpartitioned) <= 1, plan


def test_read_token_shards_round_trips_the_stream(spark, tmp_path):
    """read(write(x)) == the seeded stream, through the distributed
    shard reader (one task per file, positions rebuilt from the file
    name)."""
    from wrf_to_geodataframe_spark.operators.shards import (
        read_token_shards,
    )

    rows = _corpus()
    out = str(tmp_path / "shards")
    os.makedirs(out)
    write_training_corpus(
        _doc_tokens(spark, rows), out, SEED, shard_tokens=S
    ).collect()
    got = [
        r.tok
        for r in read_token_shards(spark, out, shard_tokens=S)
        .orderBy("gpos")
        .collect()
    ]
    assert got == _replay_stream(rows)
    with pytest.raises(ValueError, match="no shard"):
        read_token_shards(spark, str(tmp_path / "empty"))


def test_shards_epoch_reseed_permutes_but_preserves_tokens(
    spark, tmp_path
):
    """Different seeds give different epoch permutations of the SAME
    token multiset (the reshuffle-per-epoch contract); the same seed
    reproduces the identical stream."""
    import collections

    rows = _corpus()
    streams = {}
    for tag, seed in (("e0", "epoch0"), ("e1", "epoch1"), ("e0b", "epoch0")):
        out = str(tmp_path / tag)
        os.makedirs(out)
        write_training_corpus(
            _doc_tokens(spark, rows), out, seed, shard_tokens=S
        ).collect()
        streams[tag] = _read_all(out)[0]
    assert streams["e0"] == streams["e0b"]
    assert streams["e0"] != streams["e1"]
    assert collections.Counter(streams["e0"]) == collections.Counter(
        streams["e1"]
    )


def test_shards_skip_empty_documents(spark, tmp_path):
    """Zero-token documents occupy no stream positions: offsets stay
    dense and the stream equals the replay with empty docs dropped."""
    from pyspark.sql import functions as F

    rows = _corpus(20)
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.array().cast("array<long>"),
        )
        .otherwise(
            F.transform(F.split("text", " "), lambda w: hash60(w))
        )
        .alias("toks"),
    )
    out = str(tmp_path / "shards")
    os.makedirs(out)
    write_training_corpus(df, out, SEED, shard_tokens=S).collect()
    want = _replay_stream(
        [(i, t) for i, t in rows if i % 4 != 0]
    )
    assert _read_all(out)[0] == want


def test_shards_handle_documents_longer_than_a_shard(spark, tmp_path):
    """A document longer than shard_tokens spans multiple shards (the
    GPT concatenation convention) — positions stay dense across its
    boundary crossings."""
    rows = [(0, " ".join(f"a{j}" for j in range(300))),
            (1, "b0 b1 b2"),
            (2, " ".join(f"c{j}" for j in range(100)))]
    out = str(tmp_path / "shards")
    os.makedirs(out)
    man = write_training_corpus(
        _doc_tokens(spark, rows), out, SEED, shard_tokens=S
    ).collect()
    assert _read_all(out)[0] == _replay_stream(rows)
    assert sum(r.n_tokens for r in man) == 403


@pytest.mark.parametrize("hyp_seed", [0, 1])
def test_shards_fuzz_random_doc_lengths(spark, tmp_path, hyp_seed):
    """Randomized doc-length mix (empty, tiny, multi-shard) against
    the hashlib replay."""
    import random

    rng = random.Random(hyp_seed)
    rows = []
    for i in range(rng.randint(5, 40)):
        n = rng.choice([0, 1, 3, rng.randint(2, 200)])
        rows.append((i, " ".join(f"t{i}_{j}" for j in range(n))))
    nonempty = [(i, t) for i, t in rows if t]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.expr(
            "transform(filter(split(text, ' '), w -> w != ''), "
            "w -> CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT))"
        ).alias("toks"),
    )
    out = str(tmp_path / f"shards{hyp_seed}")
    os.makedirs(out)
    write_training_corpus(df, out, SEED, shard_tokens=S).collect()
    assert _read_all(out)[0] == _replay_stream(nonempty)
