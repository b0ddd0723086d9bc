from temp_tpu.train.loop import Trainer  # noqa: F401
