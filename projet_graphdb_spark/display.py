"""Output sinks: Graphviz dot for the graph, LaTeX for the binding table.

Parity with the reference's display module (``graphDB/lib/display.ml``):
sink 2 renders the final graph as dot text (display.ml:76-86), sink 3
renders the binding table as a LaTeX tabular (display.ml:102-120).  Both
are pure string generation from collected results — rendering a graph is
inherently a driver-side operation on a collect-sized result; callers
filter/sample first when the graph is large.
"""

from __future__ import annotations

from .engine.executor import Binding, binding_table
from .engine.state import GraphState


def _fmt_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def graph_to_dot(state: GraphState, max_nodes: int = 10_000) -> str:
    """Graphviz digraph of the current graph (node label + attrs, edges).

    Mirrors the shape of the reference's committed artifact
    (``graphDB/graph.dot``): one node line ``id [label="id:Label{...}"]``
    per node, one ``src -> dst [label=rel]`` per edge.
    """
    lines = ["digraph G {"]
    nodes = state.collect_nodes()
    flat = [
        (nid, label, nodes[label][nid]) for label in sorted(nodes) for nid in sorted(nodes[label])
    ]
    if len(flat) > max_nodes:
        flat = flat[:max_nodes]
        lines.append(f"  // truncated to first {max_nodes} nodes")
    for nid, label, attrs in flat:
        attr_txt = ", ".join(f"{k}: {_fmt_value(v)}" for k, v in sorted(attrs.items()))
        lines.append(f'  n{nid} [label="{nid}:{label}{{{attr_txt}}}"];')
    for src, rel, dst in sorted(state.collect_edges()):
        lines.append(f"  n{src} -> n{dst} [label={rel}];")
    lines.append("}")
    return "\n".join(lines)


def table_to_latex(binding: Binding) -> str:
    """LaTeX tabular of the binding table (display.ml:102-120 shape:
    header row of variable names, one row of node ids per binding)."""
    df = binding_table(binding)
    cols = df.columns
    rows = df.collect()
    spec = "|" + "c|" * max(len(cols), 1)
    out = ["\\begin{tabular}{" + spec + "}", "\\hline"]
    if cols:
        out.append(" & ".join(cols) + " \\\\")
        out.append("\\hline")
    for r in rows:
        out.append(" & ".join(_fmt_value(v) for v in r) + " \\\\")
    out.append("\\hline")
    out.append("\\end{tabular}")
    return "\n".join(out)


def show_state(state: GraphState, binding: Binding) -> str:
    """stdout dump of graph + table (the derived-show sink, interf.ml:65-66)."""
    nodes = state.collect_nodes()
    parts = ["graph:"]
    for label in sorted(nodes):
        for nid in sorted(nodes[label]):
            attrs = nodes[label][nid]
            attr_txt = ", ".join(f"{k}={_fmt_value(v)}" for k, v in sorted(attrs.items()))
            parts.append(f"  ({nid}:{label} {{{attr_txt}}})")
    for src, rel, dst in sorted(state.collect_edges()):
        parts.append(f"  ({src})-[:{rel}]->({dst})")
    df = binding_table(binding)
    parts.append(f"table: {df.columns}")
    for r in df.collect():
        parts.append("  " + str(list(r)))
    return "\n".join(parts)
