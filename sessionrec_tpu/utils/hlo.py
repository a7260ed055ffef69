"""Compiled-HLO collective parsing: byte counts for scaling projections
(scripts/project_scaling.py) and collective-layout tests
(tests/test_zero_opt.py, tests/test_sharded_lookup.py).

Works on both CPU-mesh HLO and AOT TPU HLO
(``jax.experimental.topologies``).  TPU wrinkles handled here:

* The collective pipeliner decomposes one logical collective into many
  async chunk computations, each textually repeating the full-shape op
  with the SAME ``channel_id`` and an ``async_collective_fusion_config``
  in its backend config — those chunk instances are deduped by
  (kind, channel) so bytes count once per logical op.  Instances
  WITHOUT the async-fusion config each count (the CPU backend reuses
  channel_id=1 across distinct collectives, so channel alone is not an
  identity).
* ``*-start`` ops carry a tuple of (operand buffers..., result
  buffers...); only the result (last shape) is counted.
* Combined collectives (one all-reduce over a tuple of tensors) count
  the sum of their tuple elements.
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s16": 2, "u16": 2, "pred": 1, "s8": 1, "u8": 1,
                "f64": 8, "s64": 8}

_COLL_RE = re.compile(
    r"=\s+(\(?[a-z0-9]+\[[^=]*?)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)(-start)?\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_CHAN_RE = re.compile(r"channel_id=(\d+)")


def unwrap(hlo_text):
    """Join HLO continuation lines (long tuple shapes wrap) so each
    statement is one line; strip /*index=N*/ comments (their '=' breaks
    the statement regex)."""
    hlo_text = re.sub(r"/\*.*?\*/", "", hlo_text)
    out = []
    for line in hlo_text.splitlines():
        s = line.strip()
        if out and not (s.startswith("%") or s.startswith("ROOT")
                        or s.endswith("{") or s == "}"
                        or s.startswith("HloModule")
                        or s.startswith("ENTRY")):
            out[-1] += " " + s
        else:
            out.append(s)
    return "\n".join(out)


def _shape_bytes(dt, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collective_ops(hlo_text, default_group=1):
    """Deduped logical collectives: [(kind, result_bytes, group_size,
    result_shapes)].  ``result_bytes`` follows the op's OUTPUT (the
    gathered buffer for all-gather, the scattered shard for
    reduce-scatter)."""
    instances = {}
    order = []
    anon = 0
    for line in unwrap(hlo_text).splitlines():
        m = _COLL_RE.search(line)
        if not m:
            continue
        shapes_txt, kind, start = m.group(1), m.group(2), m.group(3)
        shapes = _SHAPE_RE.findall(shapes_txt)
        if not shapes:
            continue
        if start:
            shapes = shapes[-1:]          # (in..., out): count the out
        total = sum(_shape_bytes(dt, dims) for dt, dims in shapes)
        g = re.search(r"replica_groups=\{\{([0-9, ]+)\}", line)
        if g:
            group = len(g.group(1).split(","))
        else:
            gi = re.search(r"replica_groups=\[(\d+),(\d+)\]", line)
            group = int(gi.group(2)) if gi else default_group
        ch = _CHAN_RE.search(line)
        if ch and "async_collective_fusion_config" in line:
            key = (kind, ch.group(1))
        else:
            anon += 1
            key = (kind, f"anon{anon}")
        pretty = [f"{dt}[{dims}]" for dt, dims in shapes]
        if key not in instances:
            instances[key] = (total, group, pretty)
            order.append(key)
        else:
            old, og, op = instances[key]
            # chunked async instances repeat the full shape; keep the
            # output-shaped one: max for gather/reduce (in >= out
            # never holds for their chunks), min for reduce-scatter
            keep = min if kind == "reduce-scatter" else max
            if keep(total, old) == total:
                instances[key] = (total, group, pretty)
    return [(k[0], *instances[k]) for k in order]


def collective_bytes(hlo_text):
    """(result bytes per collective kind, shape list per kind) over the
    deduped logical ops."""
    out, shapes_by_kind = {}, {}
    for kind, total, _, pretty in collective_ops(hlo_text):
        out[kind] = out.get(kind, 0) + total
        shapes_by_kind.setdefault(kind, []).extend(pretty)
    return out, shapes_by_kind
