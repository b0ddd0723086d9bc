from temp_tpu.models.registry import get_model  # noqa: F401
