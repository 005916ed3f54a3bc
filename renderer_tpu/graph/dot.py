"""Graphviz dumps of frame graphs.

Parity with the reference's build-time diagnostics/*.dot (pass DAG +
per-resource claim graphs, macrolib.rs:575-676) and the runtime "Dump graphs"
button writing the active culled plan (renderer.rs:2509-2581).
"""

from __future__ import annotations

import os

QUEUE_COLORS = {"graphics": "goldenrod1", "compute": "aquamarine2", "transfer": "limegreen"}


def graph_to_dot(graph) -> str:
    """Declared (un-culled) graph: passes, resources, claims."""
    lines = [f'digraph "{graph.name}" {{', "  rankdir=LR;"]
    for r in graph.resources.values():
        shape = "cylinder" if r.persistent else ("note" if r.external else "box")
        lines.append(f'  "res:{r.name}" [label="{r.name}", shape={shape}];')
    for p in graph.passes:
        color = QUEUE_COLORS.get(p.queue, "gray")
        cond = f"\\nif {list(p.condition)}" if p.condition else ""
        lines.append(
            f'  "pass:{p.name}" [label="{p.name}{cond}", shape=ellipse, '
            f'style=filled, fillcolor={color}];'
        )
        for r in p.reads:
            lines.append(f'  "res:{r}" -> "pass:{p.name}";')
        for r in p.reads_prev:
            lines.append(f'  "res:{r}" -> "pass:{p.name}" [style=dashed, label="prev"];')
        for w in p.writes:
            lines.append(f'  "pass:{p.name}" -> "res:{w}";')
    lines.append("}")
    return "\n".join(lines)


def plan_to_dot(plan) -> str:
    """Compiled (culled, ordered) plan: pass-to-pass dependencies only."""
    by_writer = {}
    for p in plan.passes:
        for w in p.writes:
            by_writer[w] = p.name
    lines = [f'digraph "{plan.graph.name}-plan" {{', "  rankdir=LR;"]
    sw = ",".join(f"{k}={int(v)}" for k, v in sorted(plan.switches.items()))
    lines.append(f'  label="switches: {sw}";')
    for i, p in enumerate(plan.passes):
        color = QUEUE_COLORS.get(p.queue, "gray")
        lines.append(
            f'  "{p.name}" [label="{i}: {p.name}", shape=ellipse, style=filled, '
            f"fillcolor={color}];"
        )
    for p in plan.passes:
        for r in p.reads:
            prod = by_writer.get(r)
            if prod and prod != p.name:
                lines.append(f'  "{prod}" -> "{p.name}" [label="{r}"];')
    lines.append("}")
    return "\n".join(lines)


def dump(graph, plans=(), directory="diagnostics") -> list:
    """Write .dot files, returns paths (ref: macrolib dump + live-diagnostics)."""
    os.makedirs(directory, exist_ok=True)
    paths = []
    p0 = os.path.join(directory, f"{graph.name}.dot")
    with open(p0, "w") as f:
        f.write(graph_to_dot(graph))
    paths.append(p0)
    for i, plan in enumerate(plans):
        pi = os.path.join(directory, f"{graph.name}-plan{i}.dot")
        with open(pi, "w") as f:
            f.write(plan_to_dot(plan))
        paths.append(pi)
    return paths
