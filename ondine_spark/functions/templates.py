"""Prompt template rendering as Spark expressions.

The reference renders prompts row-by-row in Python with ``str.format`` /
Jinja2 (reference: ondine/stages/prompt_formatter_stage.py:135-144,79-96).
Spark-first design: a simple ``{col}`` template compiles to a JVM-side
``F.concat`` of literals and columns — whole-stage-codegen, zero Python in
the hot path. Jinja2 (auto-detected on ``{{``) falls back to an
Arrow-batched pandas UDF with the compiled template cached per worker.
"""

from __future__ import annotations

import re
import string
from typing import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def render_format_template(template: str) -> Column:
    """Compile a str.format-style template (``{col}`` placeholders, no
    format specs) into a codegen-friendly concat of literals and columns.

    Null semantics: null column values render as the string "None" —
    exact Python ``str.format`` parity with the reference
    (prompt_formatter_stage renders row values through ``.format``, and
    ``"{x}".format(x=None)`` is ``"None"``) and with this engine's own
    jinja2 path (jinja stringifies None the same way). A bare concat
    would instead null the whole prompt on one null cell. Callers who
    want empty strings can coalesce first (or validate nulls away —
    see operators.curation hygiene filters).
    """
    parts: list[Column] = []
    for literal, field_name, format_spec, conversion in string.Formatter().parse(
        template
    ):
        if literal:
            parts.append(F.lit(literal))
        if field_name:
            if format_spec or conversion or "." in field_name or "[" in field_name:
                raise ValueError(
                    f"unsupported placeholder {{{field_name}}} — use a plain column "
                    "name or a jinja2 template"
                )
            parts.append(
                F.coalesce(F.col(field_name).cast("string"), F.lit("None"))
            )
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def is_jinja2(template: str, use_jinja2: bool | None) -> bool:
    """Auto-detect jinja2 on '{{' like the reference
    (prompt_formatter_stage.py:79-86) unless explicitly forced."""
    return use_jinja2 if use_jinja2 is not None else "{{" in template


_JINJA_CACHE: dict[str, object] = {}


def render_jinja2_udf(template: str, columns: list[str]) -> Column:
    """Pandas UDF rendering a jinja2 template over the given columns."""

    @F.pandas_udf("string")
    def render(*cols: pd.Series) -> pd.Series:
        try:
            from jinja2 import Template
        except ImportError as e:  # jinja2 not in this container
            raise NotImplementedError(
                "jinja2 is not installed; use {col} format templates"
            ) from e
        tmpl = _JINJA_CACHE.get(template)
        if tmpl is None:
            tmpl = Template(template, autoescape=False)
            _JINJA_CACHE[template] = tmpl
        frame = pd.concat(cols, axis=1)
        frame.columns = columns
        return frame.apply(lambda row: tmpl.render(**row.to_dict()), axis=1)

    return render(*[F.col(c) for c in columns])


def few_shot_block(examples: Iterable[dict]) -> str:
    """Format few-shot examples exactly like the reference
    (prompt_formatter_stage.py:214-232)."""
    lines = ["Here are some examples:\n"]
    for i, ex in enumerate(examples, 1):
        lines.append(f"Example {i}:")
        lines.append(f"Input: {ex.get('input', '')}")
        lines.append(f"Output: {ex.get('output', '')}")
        lines.append("")
    return "\n".join(lines)


def prompt_column(
    template: str,
    use_jinja2: bool | None = None,
    few_shot_examples: list[dict] | None = None,
    kb_context_col: str | None = None,
    evidence_context_col: str | None = None,
    available_columns: list[str] | None = None,
) -> Column:
    """Full prompt expression: template render + optional KB-context
    prepend, evidence append, few-shot prepend (reference order:
    prompt_formatter_stage.py:146-181). System message is NOT embedded —
    it travels separately so providers can cache the shared prefix.

    ``available_columns`` (when given) bounds which template variables are
    read from the frame; variables outside it stay jinja2-Undefined and
    render as '' — same as the reference's full-row-dict render where a
    template names a variable the row doesn't have."""
    if is_jinja2(template, use_jinja2):
        cols = _jinja_vars(template)
        if available_columns is not None:
            cols = [c for c in cols if c in set(available_columns)]
        if not cols:  # constant template (vars all undefined / none)
            try:
                from jinja2 import Template
            except ImportError as e:
                raise NotImplementedError(
                    "jinja2 is not installed; use {col} format templates"
                ) from e
            prompt = F.lit(Template(template, autoescape=False).render())
        else:
            prompt = render_jinja2_udf(template, cols)
    else:
        prompt = render_format_template(template)

    if kb_context_col and "_kb_context" not in template:
        ctx = F.col(kb_context_col)
        prompt = F.when(
            ctx.isNotNull() & (ctx != ""),
            F.concat(F.lit("Context:\n"), ctx, F.lit("\n\n"), prompt),
        ).otherwise(prompt)
    if evidence_context_col and "_evidence_context" not in template:
        ev = F.col(evidence_context_col)
        prompt = F.when(
            ev.isNotNull() & (ev != ""),
            F.concat(
                prompt,
                F.lit(
                    "\n\nPreviously validated answers for similar inputs "
                    "(use as reference, not as ground truth):\n"
                ),
                ev,
            ),
        ).otherwise(prompt)
    if few_shot_examples:
        prompt = F.concat(F.lit(few_shot_block(few_shot_examples) + "\n\n"), prompt)
    return prompt


def _jinja_vars(template: str) -> list[str]:
    """Template variables, via jinja2's own AST walk when available (catches
    ``{% if %}``/``{% for %}``-only vars, filters, dotted roots — everything
    the reference's full-row-dict render covers), regex fallback otherwise."""
    try:
        import jinja2
        from jinja2 import meta

        env = jinja2.Environment(autoescape=False)
        names = meta.find_undeclared_variables(env.parse(template))
        return sorted(names)
    except ImportError:
        seen: list[str] = []
        for name in re.findall(r"{{\s*([A-Za-z_][A-Za-z0-9_]*)", template):
            if name not in seen:
                seen.append(name)
        return seen
