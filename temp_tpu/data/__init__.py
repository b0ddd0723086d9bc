from temp_tpu.data.quadruples import load_quadruples, load_stat, load_id_maps  # noqa: F401
from temp_tpu.data.snapshots import TKGData, build_tkg_data  # noqa: F401
