"""Flag-remap parity: every (module, post_aggregation, post_ensemble, impute)
combination must resolve to the behavior the reference's two-stage dispatch
selects (reference main.py:42-79).

The reference's effective behavior per chosen class:
  DynamicRGCN               -> (gate=None,   imputes=False)
  ImputeDynamicRGCN         -> (gate=None,   imputes=True)   # unconditional,
                               PostDynamicRGCN.py:27 forward_isolated_impute
  PostDynamicRGCN           -> (gate='embed', imputes=args.impute)
                               # RRGCN.py:245-247 gates loc impute on the flag
  PostEnsembleDynamicRGCN   -> (gate='score', imputes=args.impute)
  SelfAttentionRGCN         -> (gate=None,   imputes=False)  # flags ignored
  PostSelfAttentionRGCN     -> (gate='embed', imputes=False)
and the remap table itself:
  uni  (main.py:66-72): if post_aggregation: Post; THEN if post_ensemble:
       PostEnsemble elif impute: Impute  -> post_ensemble beats everything,
       impute beats post_aggregation.
  bi   (main.py:58-64): elif chain post_aggregation > post_ensemble > impute.
  SA   (main.py:74-79): only post_aggregation.
"""

import itertools

import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.models.registry import get_model, normalize_remap_flags


def reference_effective(module, pa, pe, im):
    """(gate, imputes) the reference would run with, per main.py:42-79."""
    if module in ("GRRGCN", "RRGCN"):
        cls = "Dynamic"
        if pa:
            cls = "Post"
        if pe:
            cls = "PostEnsemble"
        elif im:
            cls = "Impute"
    elif module in ("BiGRRGCN", "BiRRGCN"):
        if pa:
            cls = "Post"
        elif pe:
            cls = "PostEnsemble"
        elif im:
            cls = "Impute"
        else:
            cls = "Dynamic"
    elif module in ("SARGCN", "BiSARGCN"):
        cls = "Post" if pa else "Dynamic"
        # SA Post variant has no impute/score-gating machinery at all
        return ({"Post": "embed", "Dynamic": None}[cls], False)
    else:
        return (None, False)
    gate = {"Dynamic": None, "Impute": None,
            "Post": "embed", "PostEnsemble": "score"}[cls]
    imputes = {"Dynamic": False, "Impute": True,
               "Post": im, "PostEnsemble": im}[cls]
    return (gate, imputes)


def rebuild_effective(cfg_out, model):
    """(gate, imputes) the rebuilt model runs with: post.py gates on the
    normalized cfg flags (post.py:202 impute blend; :288 embed-vs-score)."""
    name = type(model).__name__
    c = model.cfg
    if name.startswith("PostDynamic") or name.startswith("PostBiDynamic"):
        gate = ("embed" if c.post_aggregation
                else "score" if c.post_ensemble else None)
        return (gate, bool(c.impute))
    if "SelfAttention" in name:
        return ("embed" if name.startswith("Post") else None, False)
    return (None, False)


GRU_MODULES = ["GRRGCN", "BiGRRGCN"]
SA_MODULES = ["SARGCN", "BiSARGCN"]


@pytest.fixture(scope="module")
def tkg_tiny_data():
    import jax

    from temp_tpu.data.snapshots import make_synthetic
    return jax.device_put(make_synthetic(
        num_ents=20, num_rels=3, num_times=8, edges_per_time=15,
        edge_pad_multiple=16))


@pytest.mark.parametrize("module", GRU_MODULES + SA_MODULES)
@pytest.mark.parametrize("pa,pe,im", list(itertools.product([0, 1], repeat=3)))
def test_remap_matches_reference(tkg_tiny_data, module, pa, pe, im):
    cfg = TKGConfig(module=module, embed_size=16, hidden_size=16, n_bases=4,
                    train_seq_len=3, batch_size=2, post_aggregation=bool(pa),
                    post_ensemble=bool(pe), impute=bool(im))
    model = get_model(cfg, tkg_tiny_data)
    expect = reference_effective(module, pa, pe, im)
    got = rebuild_effective(cfg, model)
    assert got == expect, (
        f"{module} pa={pa} pe={pe} im={im}: reference -> {expect}, "
        f"rebuild -> {got}")


def test_normalize_is_idempotent():
    for module in GRU_MODULES + SA_MODULES:
        for pa, pe, im in itertools.product([0, 1], repeat=3):
            cfg = TKGConfig(module=module, post_aggregation=bool(pa),
                            post_ensemble=bool(pe), impute=bool(im))
            once = normalize_remap_flags(cfg)
            assert normalize_remap_flags(once) == once


def test_uni_exception_semantics():
    """The two quirky uni rows VERDICT r2 called out, pinned explicitly."""
    # post_ensemble beats post_aggregation (main.py:69-70 second `if`)
    cfg = normalize_remap_flags(TKGConfig(
        module="GRRGCN", post_aggregation=True, post_ensemble=True))
    assert cfg.post_ensemble and not cfg.post_aggregation
    # impute beats post_aggregation when post_ensemble is off (the elif
    # rebinds module away from PostDynamicRGCN)
    cfg = normalize_remap_flags(TKGConfig(
        module="GRRGCN", post_aggregation=True, impute=True))
    assert cfg.impute and not cfg.post_aggregation and not cfg.post_ensemble
    # Bi keeps post_aggregation + impute together (PostBi gates impute
    # internally, BiRRGCN.py:311-313)
    cfg = normalize_remap_flags(TKGConfig(
        module="BiGRRGCN", post_aggregation=True, post_ensemble=True,
        impute=True))
    assert cfg.post_aggregation and cfg.impute and not cfg.post_ensemble
