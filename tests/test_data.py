"""Data-plane tests: trajectory store backends (native C++ + python, shared
format), serialization round-trip, episode relabeling, bucketed collation,
TBPTT splitting, and wordpiece tokenizer parity with HF tokenizers."""

import numpy as np
import pytest

from robo_vln_tpu.data import serialization
from robo_vln_tpu.data.loader import (
    TrajectoryDataset,
    batch_iterator,
    collate_batch,
    pick_bucket,
    split_tbptt,
    write_episode,
)
from robo_vln_tpu.data.trajectory_store import TrajectoryStore, _PythonStore


def _make_episode(rng, t, instr_len=8):
    obs = {
        "rgb": rng.integers(0, 255, (t, 8, 8, 3)).astype(np.float32),
        "depth": rng.random((t, 8, 8, 1)).astype(np.float32),
        "progress": rng.random((t,)).astype(np.float32),
        "vln_oracle_action_sensor": rng.integers(1, 4, (t, 1)).astype(np.float64),
        "instruction": np.tile(
            rng.integers(1, 50, (1, instr_len)).astype(np.float64), (t, 1)
        ),
        "glove_tokens": np.tile(
            rng.integers(1, 30, (1, instr_len)).astype(np.float64), (t, 1)
        ),
    }
    prev = rng.random((t, 2))
    corr = rng.random((t, 2))
    stop_steps = [max(1, t - 2)] * t
    return obs, prev, corr, stop_steps


def test_serialization_roundtrip(rng):
    obj = [
        {"a": rng.random((3, 4)).astype(np.float32), "b": [1, 2, "x"]},
        np.arange(5, dtype=np.int64),
        {"nested": {"c": rng.integers(0, 10, (2, 2))}},
    ]
    out = serialization.unpackb(serialization.packb(obj))
    np.testing.assert_allclose(out[0]["a"], obj[0]["a"])
    np.testing.assert_array_equal(out[1], obj[1])
    np.testing.assert_array_equal(out[2]["nested"]["c"], obj[2]["nested"]["c"])


def test_flat_codec_roundtrip_and_zero_copy(rng):
    obj = [
        {"a": rng.random((3, 4)).astype(np.float16),
         "b": [1, 2, "x"],
         "nested": {"c": rng.integers(0, 10, (2, 2))}},
        np.arange(5, dtype=np.int64),
        rng.random((0, 2)),  # empty array
        [7, 8],
    ]
    buf = serialization.pack_flat(obj)
    assert serialization.is_flat(buf)
    assert not serialization.is_flat(serialization.packb([1, 2]))
    out = serialization.unpack_flat(buf)
    np.testing.assert_allclose(out[0]["a"], obj[0]["a"])
    assert out[0]["a"].dtype == np.float16
    np.testing.assert_array_equal(out[0]["nested"]["c"], obj[0]["nested"]["c"])
    np.testing.assert_array_equal(out[1], obj[1])
    assert out[2].shape == (0, 2)
    assert out[3] == [7, 8]
    # zero-copy: the decoded arrays are views into the source buffer
    src = np.frombuffer(buf, np.uint8)
    view = serialization.unpack_flat(src)[1]
    assert view.base is not None
    # unpackb_any dispatches on the magic
    out2 = serialization.unpackb_any(buf)
    np.testing.assert_array_equal(out2[1], obj[1])
    out3 = serialization.unpackb_any(serialization.packb({"k": 1}))
    assert out3 == {"k": 1}


@pytest.mark.parametrize("backend", ["native", "python"])
def test_store_get_buffer_matches_get(tmp_path, backend, rng):
    path = str(tmp_path / "traj")
    payload = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    with TrajectoryStore(path, writable=True, backend=backend) as store:
        store.put(0, payload)
        store.flush()
        buf = store.get_buffer(0)
        assert buf.dtype == np.uint8 and buf.tobytes() == payload
        assert store.get(0) == payload


@pytest.mark.parametrize("backend", ["native", "python"])
def test_store_roundtrip(tmp_path, backend, rng):
    path = str(tmp_path / "traj")
    with TrajectoryStore(path, writable=True, backend=backend) as store:
        if backend == "native":
            assert type(store._impl).__name__ == "_NativeStore", "native build failed"
        for k in range(5):
            store.put(k, f"payload-{k}".encode() * (k + 1))
        store.flush()
        assert len(store) == 5
        assert store.get(3) == b"payload-3" * 4

    with TrajectoryStore(path, backend=backend) as store:
        assert len(store) == 5
        assert store.get(0) == b"payload-0"


def test_store_cross_backend(tmp_path):
    """Native-written files readable by the python backend and vice versa."""
    path = str(tmp_path / "traj")
    with TrajectoryStore(path, writable=True, backend="native") as store:
        store.put(7, b"written-native")
        store.flush()
    with TrajectoryStore(path, backend="python") as store:
        assert store.get(7) == b"written-native"
    with TrajectoryStore(path, writable=True, backend="python") as store:
        store.put(8, b"written-python")
        store.flush()
    with TrajectoryStore(path, backend="native") as store:
        assert store.get(7) == b"written-native"
        assert store.get(8) == b"written-python"
        assert len(store) == 2


def test_dataset_relabeling(tmp_path, rng):
    path = str(tmp_path / "traj")
    with TrajectoryStore(path, writable=True) as store:
        obs, prev, corr, stop = _make_episode(rng, t=10)
        write_episode(store, 0, obs, prev, corr, stop)
        store.flush()

    ds = TrajectoryDataset(path, batch_size=1, is_bert=True)
    obs_d, prev_d, corr_d, ostop = next(iter(ds))
    # stop_step = 8 -> from index 7 on: sub-goal class 4, oracle_stop 1
    assert (obs_d["vln_oracle_action_sensor"][7:] == 4).all()
    assert (obs_d["vln_oracle_action_sensor"][:7] != 4).all()
    np.testing.assert_array_equal(ostop[7:], 1.0)
    np.testing.assert_array_equal(ostop[:7], 0.0)
    assert obs_d["instruction"].ndim == 1  # single row
    assert prev_d.shape == (10, 2)


def test_collate_and_tbptt(tmp_path, rng):
    path = str(tmp_path / "traj")
    with TrajectoryStore(path, writable=True) as store:
        for k, t in enumerate([10, 14, 7, 12]):
            write_episode(store, k, *_make_episode(rng, t))
        store.flush()

    ds = TrajectoryDataset(path, batch_size=2, is_bert=False)
    buckets = [8, 16, 32]
    batches = list(batch_iterator(ds, 2, buckets, max_instruction_len=20))
    assert len(batches) == 2
    for b in batches:
        B, T = b["prev_actions"].shape[:2]
        assert T in buckets and B == 2
        assert b["instruction"].shape == (2, 20)
        assert b["not_done_masks"][:, 0].sum() == 0
        assert (b["not_done_masks"][:, 1:] == 1).all()
        # padding: oracle_stop -1 exactly where valid_mask is 0
        pad = b["valid_mask"] == 0
        assert (b["oracle_stop"][..., 0][pad] == -1).all()
        assert (b["oracle_stop"][..., 0][~pad] != -1).all()

        wins = list(split_tbptt(b, 8))
        assert sum(w["prev_actions"].shape[1] for w in wins) == T
        assert all(w["instruction"].shape == (2, 20) for w in wins)


def test_flat_buffer_batches_match_msgpack(tmp_path, rng):
    """A buffer written in the flat wire format (the feature store's
    encoding, training/featurize.py) must produce bit-identical collated
    batches to the same episodes written as msgpack."""
    episodes = [_make_episode(rng, t) for t in [10, 14, 7, 12]]
    paths = {}
    for fmt, flat in (("msg", False), ("flat", True)):
        paths[fmt] = str(tmp_path / fmt)
        with TrajectoryStore(paths[fmt], writable=True) as store:
            for k, ep in enumerate(episodes):
                write_episode(store, k, *ep, flat=flat)
            store.flush()

    for is_bert in (True, False):
        batches = {}
        for fmt in paths:
            ds = TrajectoryDataset(paths[fmt], batch_size=2, is_bert=is_bert, seed=3)
            batches[fmt] = list(batch_iterator(ds, 2, [16], max_instruction_len=20))
        assert len(batches["msg"]) == len(batches["flat"]) == 2
        for bm, bf in zip(batches["msg"], batches["flat"]):
            assert set(bm) == set(bf)
            for k in bm:
                assert bm[k].dtype == bf[k].dtype, k
                np.testing.assert_array_equal(bm[k], bf[k], err_msg=k)


def test_collate_mixed_instruction_lengths(tmp_path, rng):
    """Episodes whose instructions differ in token count must batch together
    (real robo_vln instructions are variable-length).  Regression: with
    is_bert=True the per-step variable-length `glove_tokens` rows used to
    leak into the static-shape sensor collate and crash."""
    path = str(tmp_path / "traj")
    with TrajectoryStore(path, writable=True) as store:
        for k, (t, il) in enumerate([(10, 14), (12, 23), (9, 5), (11, 17)]):
            write_episode(store, k, *_make_episode(rng, t, instr_len=il))
        store.flush()

    for is_bert in (True, False):
        ds = TrajectoryDataset(path, batch_size=2, is_bert=is_bert)
        batches = list(batch_iterator(ds, 2, [16], max_instruction_len=30))
        assert len(batches) == 2
        for b in batches:
            assert "glove_tokens" not in b
            assert b["instruction"].shape == (2, 30)
            # each row carries its episode's ids then zero padding
            lens = (b["instruction"] != 0).sum(axis=1)
            assert set(lens.tolist()) <= {5, 14, 17, 23}


def test_collate_transfer_dtypes(tmp_path, rng):
    """Host->device transfer dtypes (SENSOR_DTYPES): rgb rides as uint8 and
    depth as f16 through collate (the reference materializes everything as
    float32, robo_vln_trainer.py:119-131); values survive the cast."""
    from robo_vln_tpu.data.loader import SENSOR_DTYPES
    from robo_vln_tpu.envs.obs_utils import batch_obs_data_collect

    path = str(tmp_path / "traj")
    with TrajectoryStore(path, writable=True) as store:
        obs, prev, corr, stop = _make_episode(rng, t=6)
        write_episode(store, 0, obs, prev, corr, stop)
        store.flush()
    ds = TrajectoryDataset(path, batch_size=1, is_bert=True)
    batch = collate_batch([next(iter(ds))], buckets=[8], max_instruction_len=10)
    assert batch["rgb"].dtype == np.uint8
    assert batch["depth"].dtype == np.float16
    assert batch["instruction"].dtype == np.int32
    assert batch["corrected_actions"].dtype == np.float32
    np.testing.assert_array_equal(
        batch["rgb"][0, :6], obs["rgb"].astype(np.uint8)
    )
    np.testing.assert_allclose(
        batch["depth"][0, :6], obs["depth"], atol=1e-3  # f16 rounding
    )

    # the collection buffer also stores images compactly (uint8/f16),
    # shrinking the reference's ~1.5 TB float buffer ~4x
    stacked = batch_obs_data_collect(
        [{"rgb": obs["rgb"][i], "depth": obs["depth"][i]} for i in range(3)]
    )
    assert stacked["rgb"].dtype == SENSOR_DTYPES["rgb"]
    assert stacked["depth"].dtype == SENSOR_DTYPES["depth"]


def test_pick_bucket():
    assert pick_bucket(1, [100, 200]) == 100
    assert pick_bucket(100, [100, 200]) == 100
    assert pick_bucket(101, [100, 200]) == 200
    assert pick_bucket(999, [100, 200]) == 200  # clamps to last


def test_wordpiece_matches_hf(tmp_path):
    from robo_vln_tpu.data.tokenizer import InstructionTokenizer, WordPieceTokenizer

    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "walk", "to", "the", "red", "chair", "turn", "left", "##s",
        "##ing", "kitchen", "door", ",", ".", "walk", "go",
    ]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n")

    text = "Walk to the red chairs, turning LEFT at the KITCHEN door."
    own = WordPieceTokenizer.from_vocab_file(str(vf)).encode(text)

    from tokenizers import BertWordPieceTokenizer

    hf = BertWordPieceTokenizer(str(vf), lowercase=True).encode(text).ids
    assert own == hf

    tok = InstructionTokenizer(str(vf), max_len=30)
    padded = tok.encode(text)
    assert padded.shape == (30,)
    assert list(padded[: len(hf)]) == hf
    assert (padded[len(hf):] == 0).all()
