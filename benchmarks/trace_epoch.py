#!/usr/bin/env python
"""Capture an XProf trace of one fused training epoch on the real chip and
dump a per-op time attribution (VERDICT r2 item 1b: attribute the end-to-end
roofline gap). Writes the raw trace to results/round3/trace/ and prints a
JSON summary of the top HLO ops by self time, parsed from the .xplane.pb via
tensorflow-free protobuf walking (the xplane format is just nested protos).
"""

from __future__ import annotations

import glob
import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# -- minimal xplane.pb parser (XSpace proto, protobuf wire walking) -----------

def _walk(buf, handlers, ctx=None):
    i = 0
    n = len(buf)
    while i < n:
        key, i = _uvarint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _uvarint(buf, i)
        elif wire == 1:
            v = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        elif wire == 5:
            v = struct.unpack_from("<I", buf, i)[0]
            i += 4
        elif wire == 2:
            ln, i = _uvarint(buf, i)
            v = buf[i:i + ln]
            i += ln
        else:
            raise ValueError(f"wire {wire}")
        h = handlers.get(field)
        if h:
            h(v, ctx)


def _uvarint(buf, i):
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, i


def parse_xplane(path):
    """Return [(plane_name, line_name, event_name, total_ps, count)]."""
    blob = open(path, "rb").read()
    rows = []

    def plane(v, _):
        # XPlane{id=1, name=2, lines=3, event_metadata(map)=4}
        meta = {}
        lines = []
        name = [""]

        def pname(x, _):
            name[0] = x.decode()

        def pmeta(x, _):
            # map entry {key=1 int64, value=2 XEventMetadata{id=1, name=2}}
            mid = [0]
            mname = [""]

            def value(b, _):
                _walk(b, {1: lambda a, _: mid.__setitem__(0, a),
                          2: lambda a, _: mname.__setitem__(0, a.decode())})

            _walk(x, {1: lambda a, _: mid.__setitem__(0, a), 2: value})
            meta[mid[0]] = mname[0]

        def pline(x, _):
            lines.append(x)

        _walk(v, {2: pname, 3: pline, 4: pmeta})

        for ln in lines:
            lname = [""]
            events = []

            def lnname(x, _):
                lname[0] = x.decode()

            def levent(x, _):
                eid = [0]
                dur = [0]
                _walk(x, {1: lambda a, _: eid.__setitem__(0, a),
                          3: lambda a, _: dur.__setitem__(0, a)})
                events.append((eid[0], dur[0]))

            _walk(ln, {2: lnname, 4: levent})
            agg = {}
            for eid, dur in events:
                nm = meta.get(eid, str(eid))
                t, c = agg.get(nm, (0, 0))
                agg[nm] = (t + dur, c + 1)
            for nm, (t, c) in agg.items():
                rows.append((name[0], lname[0], nm, t, c))
    _walk(blob, {1: plane})
    return rows


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.registry import get_model
    from temp_tpu.train.loop import Trainer

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "results/round3/trace"
    cfg = TKGConfig.from_json_file("grid/icews14/config_grrgcn.json")
    data = build_tkg_data(cfg)
    model = get_model(cfg, data)
    trainer = Trainer(cfg, model, data, run_dir="/tmp/temp_tpu_trace_run")
    params, opt_state = trainer.init_state()
    tp, tv = trainer._stack_batches(data.num_times, cfg.batch_size, None)
    tp, tv = jnp.asarray(tp), jnp.asarray(tv)

    def epoch(p, o, i):
        return trainer.train_epoch(p, o, trainer.data, tp, tv,
                                   jax.random.PRNGKey(i))

    params, opt_state, losses = epoch(params, opt_state, 0)  # compile
    float(np.asarray(losses)[-1])

    jax.profiler.start_trace(out_dir)
    t0 = time.time()
    params, opt_state, losses = epoch(params, opt_state, 1)
    float(np.asarray(losses)[-1])
    wall = time.time() - t0
    jax.profiler.stop_trace()

    report = {"wall_s": round(wall, 3), "device": jax.devices()[0].device_kind}
    planes = []
    for pb in glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                        recursive=True):
        try:
            planes += parse_xplane(pb)
        except Exception as e:
            report["parse_error"] = f"{pb}: {e}"
    tpu_ops = [r for r in planes if "TPU" in r[0] or "tpu" in r[0]]
    agg = {}
    for _, line, name, ps, c in tpu_ops:
        t, cc = agg.get(name, (0, 0))
        agg[name] = (t + ps, cc + c)
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
    report["total_tpu_op_ms"] = round(sum(t for t, _ in agg.values()) / 1e9, 3)
    report["top_ops"] = [
        {"op": nm, "ms": round(t / 1e9, 3), "count": c}
        for nm, (t, c) in top]
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
