from temp_tpu.ops.segment import rel_spmm, in_degree_norm, segment_sum  # noqa: F401
from temp_tpu.ops.membership import lex_member  # noqa: F401
from temp_tpu.ops.scores import get_score_fn, score_candidates_all  # noqa: F401
from temp_tpu.ops.gru import gru_cell, gru_stack, type1_gru_cell  # noqa: F401
from temp_tpu.ops.sampling import draw_negatives, subsample_edges  # noqa: F401
from temp_tpu.ops.ranking import filtered_ranks  # noqa: F401
