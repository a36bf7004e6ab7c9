"""CLI entry points, mirroring the reference driver (``graphDB/bin/main.ml``):

  python -m projet_graphdb_spark f <file.q>   run the full pipeline
                                              (parse → normalize → typecheck →
                                              execute → display), E1
  python -m projet_graphdb_spark i            interactive normalization
                                              debugger (parse + normalize,
                                              no typecheck/exec), E2
  anything else                               this help text, E3

``f`` additionally writes graph.dot and table.tex next to the input file
(sinks 2 and 3, display.ml:76-120) unless --no-artifacts is given.
"""

from __future__ import annotations

import os
import sys


def print_help():
    print(__doc__)


def run_file(path: str, artifacts: bool = True):
    from .display import graph_to_dot, show_state, table_to_latex
    from .engine import get_spark, run_program

    src = open(path).read()
    spark = get_spark(app_name=f"miniGQL:{os.path.basename(path)}")
    state, binding = run_program(spark, src)
    print(show_state(state, binding))
    if artifacts:
        base = os.path.dirname(os.path.abspath(path))
        dot_path = os.path.join(base, "graph.dot")
        tex_path = os.path.join(base, "table.tex")
        with open(dot_path, "w") as f:
            f.write(graph_to_dot(state) + "\n")
        with open(tex_path, "w") as f:
            f.write(table_to_latex(binding) + "\n")
        print(f"wrote {dot_path} and {tex_path}")
        _render(dot_path, tex_path, base)


def _render(dot_path: str, tex_path: str, base: str):
    """Shell out to the PDF renderers when installed, like the reference
    driver (display.ml:85 ``dot -Tpdf``, display.ml:119 ``pdflatex``);
    silently skipped when the tools are absent."""
    import shutil
    import subprocess

    if shutil.which("dot"):
        pdf = os.path.join(base, "graph.pdf")
        subprocess.run(
            ["dot", "-Tpdf", dot_path, "-o", pdf],
            check=False,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        print(f"rendered {pdf}")
    if shutil.which("pdflatex"):
        subprocess.run(
            ["pdflatex", "-interaction=batchmode", os.path.basename(tex_path)],
            cwd=base,
            check=False,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        print(f"rendered {os.path.join(base, 'table.pdf')}")


def run_interactive():
    """Parse + normalize each ;;-free line block from stdin and print the
    instruction stream in the reference's ``show_norm_prog`` constructor
    shape (interf.ml:50-56) — a normalization debugger."""
    from .frontend import normalize, parse
    from .frontend.show import show_norm_query

    print("miniGQL normalization debugger — enter a program, end with EOF (Ctrl-D)")
    src = sys.stdin.read()
    prog = normalize(parse(src))
    print(show_norm_query(prog))


def main(argv: list) -> int:
    if len(argv) >= 2 and argv[0] == "f":
        run_file(argv[1], artifacts="--no-artifacts" not in argv)
        return 0
    if argv and argv[0] == "i":
        run_interactive()
        return 0
    print_help()
    return 0 if not argv else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
