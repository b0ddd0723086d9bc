"""TensorBoard event writer round-trip + trainer integration (VERDICT r2
item 10; reference logging surface: utils/utils.py:58-65 TestTube logger)."""

import glob
import os
import struct

import jax
import pytest

from temp_tpu.utils.tbevents import (EventWriter, _masked_crc, frame_record,
                                     read_scalars)


def test_round_trip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalars(0, {"train/loss": 1.5, "val/mrr": 0.25})
    w.add_scalars(1, {"train/loss": 1.25, "val/mrr": 0.5})
    events = read_scalars(w.path)
    assert [e[0] for e in events] == [0, 1]
    assert events[0][1]["train/loss"] == pytest.approx(1.5)
    assert events[1][1]["val/mrr"] == pytest.approx(0.5)


def test_crc32c_known_vectors():
    # crc32c("123456789") = 0xE3069283 (Castagnoli standard check value)
    from temp_tpu.utils.tbevents import _crc32c
    assert _crc32c(b"123456789") == 0xE3069283
    # masking matches TFRecord spec
    crc = _crc32c(b"abc")
    assert _masked_crc(b"abc") == (((crc >> 15) | (crc << 17))
                                   + 0xA282EAD8) & 0xFFFFFFFF


def test_record_framing():
    rec = frame_record(b"payload")
    (ln,) = struct.unpack_from("<Q", rec, 0)
    assert ln == 7 and rec[12:19] == b"payload" and len(rec) == 23


def test_trainer_writes_event_file(tmp_path):
    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import make_synthetic
    from temp_tpu.models.registry import get_model
    from temp_tpu.train.loop import Trainer

    data = jax.device_put(make_synthetic(num_ents=20, num_rels=3, num_times=6,
                                         edges_per_time=12, edge_pad_multiple=8))
    cfg = TKGConfig(module="SRGCN", embed_size=8, hidden_size=8, n_bases=4,
                    train_seq_len=2, batch_size=2, negative_rate=4,
                    neg_oversample=4, num_pos_facts=16)
    trainer = Trainer(cfg, get_model(cfg, data), data, run_dir=str(tmp_path))
    trainer.fit(max_epochs=2, log_fn=lambda *_: None)
    files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_scalars(files[0])
    assert len(events) == 2
    assert set(events[0][1]) >= {"train/loss", "val/mrr", "val/hit_10"}
