"""Report formatters: markdown / json / csv / console table.

Layout parity with the reference's formatters
(/root/reference/src/core/formatters.py:15-197): same column order as the
printed profile (verification_output.txt:62-120), proportions at 2dp
display, numerics at 4dp display, thousands separators on counts, and
append-to-file mode (main.py:289-293). Rendering happens driver-side on
the collected profile — the profile result is partitions × columns rows,
never data-sized.

Deliberate divergence (SURVEY.md §4.3): the reference's formatters also
carry the falsy-0.0→None bug (formatters.py:171-175); we render 0.0 as
"0.00"."""

from __future__ import annotations

import csv
import io
import json
from typing import Iterable

PROFILE_COLUMNS = [
    "column_name",
    "data_type",
    "row_count",
    "not_null_proportion",
    "distinct_proportion",
    "distinct_count",
    "is_unique",
    "min_value",
    "max_value",
    "avg_value",
    "median_value",
    "stddev_pop",
    "stddev_samp",
]


def _fmt(col: str, v) -> str:
    if v is None:
        return ""
    if col in ("not_null_proportion", "distinct_proportion"):
        return f"{v:.2f}"  # formatters.py:166-175 2dp proportions
    if col in ("avg_value", "median_value", "stddev_pop", "stddev_samp"):
        return f"{v:.4f}"  # 4dp numeric display
    if col in ("row_count", "distinct_count"):
        return f"{v:,}"  # thousands separators (main.py:373-381)
    if isinstance(v, bool):
        return "Yes" if v else "No"
    return str(v)


def _rows(profile_rows: Iterable, columns: list[str]) -> list[list[str]]:
    return [[_fmt(c, getattr(r, c, None)) for c in columns] for r in profile_rows]


def format_markdown(profile_rows: list, table_name: str, columns: list[str] | None = None) -> str:
    cols = columns or PROFILE_COLUMNS
    lines = [f"## Profile: {table_name}", ""]
    lines.append("| " + " | ".join(cols) + " |")
    lines.append("|" + "|".join("---" for _ in cols) + "|")
    for row in _rows(profile_rows, cols):
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines) + "\n"


def format_json(profile_rows: list, table_name: str) -> str:
    return json.dumps(
        {
            "table_name": table_name,
            "columns": [r.asDict(recursive=True) for r in profile_rows],
        },
        default=str,
        indent=2,
    )


def format_csv(profile_rows: list, columns: list[str] | None = None) -> str:
    cols = columns or PROFILE_COLUMNS
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(cols)
    for row in _rows(profile_rows, cols):
        w.writerow(row)
    return buf.getvalue()


def format_table(profile_rows: list, table_name: str, columns: list[str] | None = None) -> str:
    """Console table (formatters.py:15-60 style)."""
    cols = columns or PROFILE_COLUMNS
    rows = _rows(profile_rows, cols)
    widths = [
        max(len(c), *(len(r[i]) for r in rows)) if rows else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [f"Table: {table_name}", sep]
    out.append("| " + " | ".join(c.ljust(w) for c, w in zip(cols, widths)) + " |")
    out.append(sep)
    for r in rows:
        out.append("| " + " | ".join(v.ljust(w) for v, w in zip(r, widths)) + " |")
    out.append(sep)
    return "\n".join(out) + "\n"


FORMATTERS = {
    "markdown": lambda rows, name: format_markdown(rows, name),
    "json": lambda rows, name: format_json(rows, name),
    "csv": lambda rows, name: format_csv(rows),
    "table": lambda rows, name: format_table(rows, name),
}


def write_report(
    text: str, output_file: str | None, append: bool = False
) -> None:
    """stdout or file, with append mode (main.py:289-293)."""
    if output_file is None:
        print(text)
    else:
        with open(output_file, "a" if append else "w") as f:
            f.write(text)
