"""Search-tree visualization (reference: utils.py:57-83 plot_mcts_tree).

Renders an array tree (mcts/tree.py) to Graphviz DOT text or an indented
console dump — no graphviz/networkx dependency needed to produce the DOT;
render with any dot viewer.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _snapshot(tree, game: Optional[int]):
    """Pull one game's arrays to host (tree may be batched or single)."""
    def get(x):
        a = np.asarray(x)
        return a[game] if game is not None else a

    rows = np.asarray(tree.parent).shape[-1]
    A = tree.num_actions
    # Rebuild the child-pointer matrix from the parent links (the array tree
    # stores no children buffer — see mcts/tree.py child_row).
    parent = get(tree.parent)
    parent_action = get(tree.parent_action)
    children = np.full((rows, A), -1, np.int64)
    for c in range(min(rows - 1, int(get(tree.next_free)))):  # skip dummy/junk
        p, a = int(parent[c]), int(parent_action[c])
        if p >= 0 and a >= 0:
            children[p, a] = c
    return {
        "children": children,
        "parent_action": parent_action,
        "n": get(tree.n),
        "q": get(tree.q),
        "v": get(tree.v),
        # The stored row packs the valid mask as a -1 sentinel
        # (tree.INVALID_PRIOR); display the clean probabilities.
        "prior": np.maximum(get(tree.prior).reshape(rows, A), 0.0),
        "next_free": int(get(tree.next_free)),
    }


def tree_to_dot(tree, game: Optional[int] = None, max_depth: int = 3,
                max_children: int = 8) -> str:
    """DOT digraph of the most-visited part of the tree."""
    t = _snapshot(tree, game)
    lines: List[str] = [
        "digraph mcts {",
        '  node [shape=box, fontname="monospace", fontsize=10];',
    ]

    def visit(node: int, depth: int) -> None:
        n, q, v = t["n"][node], t["q"][node], t["v"][node]
        lines.append(
            f'  n{node} [label="#{node}\\nn={n} q={q:.2f} v={v:.2f}"];'
        )
        if depth >= max_depth:
            return
        kids = [
            (int(t["n"][c]), a, int(c))
            for a, c in enumerate(t["children"][node]) if c >= 0
        ]
        kids.sort(reverse=True)
        for visits, a, c in kids[:max_children]:
            p = t["prior"][node][a]
            lines.append(f'  n{node} -> n{c} [label="a={a} p={p:.2f}"];')
            visit(c, depth + 1)

    visit(0, 0)
    lines.append("}")
    return "\n".join(lines)


def tree_to_text(tree, game: Optional[int] = None, max_depth: int = 2,
                 max_children: int = 5) -> str:
    """Indented console dump (the quick-look equivalent)."""
    t = _snapshot(tree, game)
    out: List[str] = []

    def visit(node: int, depth: int, prefix: str) -> None:
        out.append(
            f"{prefix}#{node} n={t['n'][node]} q={t['q'][node]:.3f} "
            f"v={t['v'][node]:.3f}"
        )
        if depth >= max_depth:
            return
        kids = [
            (int(t["n"][c]), a, int(c))
            for a, c in enumerate(t["children"][node]) if c >= 0
        ]
        kids.sort(reverse=True)
        for visits, a, c in kids[:max_children]:
            out.append(f"{prefix}  a={a} (p={t['prior'][node][a]:.2f}):")
            visit(c, depth + 1, prefix + "    ")

    visit(0, 0, "")
    return "\n".join(out)
