"""Build the jaeger-tpu documentation site: docs/*.md -> HTML + API reference.

Role parity with the reference Sphinx site (`/root/reference/docs/_source/conf.py`:
myst_parser + autodoc + furo theme). Sphinx is not available in this image, so
the site is built with what IS in-image and therefore verifiable:

- markdown-it (the same CommonMark core MyST wraps) renders the hand-written
  pages in `docs/*.md`, with pygments fenced-code highlighting;
- a docstring walker over the public `jaeger_tpu` modules produces the API
  reference pages (the `sphinx.ext.autodoc` role);
- one fixed stylesheet gives the furo-like two-pane layout.

Usage:
    python docs/build_site.py [--out docs/_site]

The build is pinned by tests/test_docs_site.py (pages render, internal links
resolve, API pages carry real docstrings).
"""

from __future__ import annotations

import argparse
import html
import importlib
import inspect
import pkgutil
import re
import sys
from pathlib import Path

DOCS = Path(__file__).resolve().parent
REPO = DOCS.parent

# Hand-written pages, in sidebar order (index first).
PAGES = [
    "index.md",
    "installation.md",
    "usage.md",
    "utils.md",
    "train.md",
    "parallelism.md",
    "optimizations.md",
    "int8_qualification.md",
    "fidelity.md",
    "releasing.md",
]

# Public API surface to document (module -> one-line sidebar label).
API_MODULES = [
    ("jaeger_tpu.cli", "command-line entry points"),
    ("jaeger_tpu.commands.predict", "predict pipeline"),
    ("jaeger_tpu.commands.train", "training pipeline"),
    ("jaeger_tpu.commands.taxonomy", "taxonomy build/predict"),
    ("jaeger_tpu.infer.engine", "inference engine"),
    ("jaeger_tpu.models.builder", "YAML -> model builder"),
    ("jaeger_tpu.models.layers", "layer zoo"),
    ("jaeger_tpu.models.conversion", "StableHLO export"),
    ("jaeger_tpu.ops.encode", "on-device encode"),
    ("jaeger_tpu.seqops.windows", "host windowing"),
    ("jaeger_tpu.train.data", "NPZ/TFRecord loaders"),
    ("jaeger_tpu.train.losses", "losses"),
    ("jaeger_tpu.train.optimizers", "optimizers"),
    ("jaeger_tpu.train.callbacks", "callbacks"),
    ("jaeger_tpu.parallel.mesh", "device meshes"),
    ("jaeger_tpu.parallel.hyena_sp", "sequence-sharded Hyena"),
    ("jaeger_tpu.postprocess.collect", "TSV collection"),
    ("jaeger_tpu.postprocess.prophages", "prophage reports"),
    ("jaeger_tpu.dataops.convert", "CSV -> NPZ"),
    ("jaeger_tpu.utils.registry", "model registry/download"),
]

CSS = """
:root { --fg:#1a1c1e; --bg:#ffffff; --muted:#5f6368; --line:#e3e5e8;
        --accent:#7a2048; --code-bg:#f6f7f8; --side:#fafafa; }
@media (prefers-color-scheme: dark) {
  :root { --fg:#e3e5e8; --bg:#131416; --muted:#9aa0a6; --line:#2a2d30;
          --accent:#e58aa9; --code-bg:#1d1f22; --side:#18191b; } }
* { box-sizing: border-box; }
body { margin:0; font:16px/1.6 system-ui,-apple-system,"Segoe UI",sans-serif;
       color:var(--fg); background:var(--bg); }
a { color:var(--accent); text-decoration:none; }
a:hover { text-decoration:underline; }
.layout { display:flex; min-height:100vh; }
nav { width:260px; flex:none; background:var(--side);
      border-right:1px solid var(--line); padding:1.2rem 1rem; }
nav .brand { font-weight:700; font-size:1.1rem; margin-bottom:1rem; display:block; }
nav h3 { font-size:.72rem; text-transform:uppercase; letter-spacing:.08em;
         color:var(--muted); margin:1.2rem 0 .3rem; }
nav ul { list-style:none; margin:0; padding:0; }
nav li a { display:block; padding:.15rem .4rem; border-radius:4px;
           color:var(--fg); font-size:.92rem; }
nav li a.current { background:var(--line); font-weight:600; }
main { flex:1; min-width:0; max-width:52rem; padding:2rem 3rem 4rem; }
h1,h2,h3 { line-height:1.25; } h1 { margin-top:0; }
h2 { border-bottom:1px solid var(--line); padding-bottom:.25rem; }
code { background:var(--code-bg); padding:.1em .35em; border-radius:4px;
       font:.88em/1.5 ui-monospace,SFMono-Regular,Menlo,monospace; }
pre { background:var(--code-bg); border:1px solid var(--line); border-radius:6px;
      padding: .8rem 1rem; overflow-x:auto; }
pre code { background:none; padding:0; }
table { border-collapse:collapse; width:100%; font-size:.92rem; }
th,td { border:1px solid var(--line); padding:.35rem .6rem; text-align:left; }
th { background:var(--code-bg); }
blockquote { border-left:3px solid var(--accent); margin:0; padding:0 1rem;
             color:var(--muted); }
.api-obj { border:1px solid var(--line); border-radius:6px; margin:1rem 0;
           padding:.8rem 1rem; }
.api-sig { font:.88em ui-monospace,Menlo,monospace; color:var(--accent);
           word-break:break-all; }
.api-doc { margin:.5rem 0 0; white-space:pre-wrap; font-size:.92rem; }
footer { color:var(--muted); font-size:.8rem; margin-top:3rem;
         border-top:1px solid var(--line); padding-top:1rem; }
""".strip()


def _renderer():
    from markdown_it import MarkdownIt

    def highlight(code: str, lang: str, attrs: str) -> str:
        try:
            from pygments import highlight as hl
            from pygments.formatters import HtmlFormatter
            from pygments.lexers import get_lexer_by_name

            if lang:
                return hl(code, get_lexer_by_name(lang), HtmlFormatter(nowrap=True))
        except Exception:
            pass
        return html.escape(code)

    # "gfm-like" needs linkify-it-py (not in-image); commonmark + the two
    # GFM extensions the docs actually use covers the same pages.
    return MarkdownIt("commonmark", {"highlight": highlight}).enable(
        ["table", "strikethrough"]
    )


def _md_links_to_html(body: str) -> str:
    # Rewrite relative intra-docs links: foo.md -> foo.html (keep anchors).
    return re.sub(
        r'href="(?!https?://|/)([^"#]+)\.md(#[^"]*)?"',
        lambda m: f'href="{m.group(1)}.html{m.group(2) or ""}"',
        body,
    )


def _page_title(md_text: str, fallback: str) -> str:
    for line in md_text.splitlines():
        if line.startswith("# "):
            return line[2:].strip()
    return fallback


def _nav(current: str, depth: int = 0) -> str:
    pre = "../" * depth
    items = []
    for page in PAGES:
        href = pre + page.replace(".md", ".html")
        label = _page_title((DOCS / page).read_text(), page) if (DOCS / page).exists() else page
        cls = ' class="current"' if page == current else ""
        items.append(f'<li><a{cls} href="{href}">{html.escape(label)}</a></li>')
    api_items = []
    for mod, label in API_MODULES:
        href = f"{pre}api/{mod}.html"
        cls = ' class="current"' if current == f"api/{mod}" else ""
        api_items.append(
            f'<li><a{cls} href="{href}" title="{html.escape(label)}">'
            f"{html.escape(mod.removeprefix('jaeger_tpu.'))}</a></li>"
        )
    return (
        f'<nav><a class="brand" href="{pre}index.html">jaeger-tpu</a>'
        f"<h3>Guide</h3><ul>{''.join(items)}</ul>"
        f"<h3>API reference</h3><ul>{''.join(api_items)}</ul></nav>"
    )


def _shell(title: str, nav_html: str, body: str, depth: int = 0) -> str:
    pre = "../" * depth
    return (
        "<!doctype html><html lang=\"en\"><head><meta charset=\"utf-8\">"
        '<meta name="viewport" content="width=device-width, initial-scale=1">'
        f"<title>{html.escape(title)} — jaeger-tpu</title>"
        f'<link rel="stylesheet" href="{pre}style.css"></head><body>'
        f'<div class="layout">{nav_html}<main>{body}'
        "<footer>jaeger-tpu — TPU-native rebuild of Jaeger. Site built by "
        "<code>docs/build_site.py</code>.</footer></main></div></body></html>"
    )


def _api_page(modname: str, label: str) -> str:
    mod = importlib.import_module(modname)
    parts = [f"<h1><code>{html.escape(modname)}</code></h1>"]
    if mod.__doc__:
        parts.append(f'<p class="api-doc">{html.escape(inspect.cleandoc(mod.__doc__))}</p>')

    def doc_obj(name: str, obj) -> str:
        try:
            sig = str(inspect.signature(obj))
        except (TypeError, ValueError):
            sig = ""
        doc = inspect.getdoc(obj) or ""
        kind = "class" if inspect.isclass(obj) else "def"
        body = f'<div class="api-obj"><span class="api-sig">{kind} {html.escape(name)}{html.escape(sig)}</span>'
        if doc:
            body += f'<p class="api-doc">{html.escape(doc)}</p>'
        if inspect.isclass(obj):
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") and mname != "__call__":
                    continue
                if callable(meth) and (inspect.getdoc(meth) or "") and getattr(meth, "__qualname__", "").startswith(obj.__name__):
                    try:
                        msig = str(inspect.signature(meth))
                    except (TypeError, ValueError):
                        msig = ""
                    body += (
                        f'<div style="margin:.6rem 0 0 1rem"><span class="api-sig">.{html.escape(mname)}{html.escape(msig)}</span>'
                        f'<p class="api-doc">{html.escape(inspect.getdoc(meth))}</p></div>'
                    )
        return body + "</div>"

    public = getattr(mod, "__all__", None)
    names = public or [n for n in sorted(vars(mod)) if not n.startswith("_")]
    n_documented = 0
    for name in names:
        obj = getattr(mod, name, None)
        if obj is None or not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue  # re-exports documented at their home module
        parts.append(doc_obj(name, obj))
        n_documented += 1
    if not n_documented:
        parts.append("<p>(no public functions or classes)</p>")
    return "".join(parts)


def build(out: Path) -> list[Path]:
    # Imports for the API walk must not grab the TPU (axon sitecustomize
    # force-registers it at interpreter start — CLAUDE.md).
    import jax

    jax.config.update("jax_platforms", "cpu")

    md = _renderer()
    out.mkdir(parents=True, exist_ok=True)
    (out / "api").mkdir(exist_ok=True)
    written = []

    (out / "style.css").write_text(CSS)
    written.append(out / "style.css")

    for page in PAGES:
        src = DOCS / page
        text = src.read_text()
        body = _md_links_to_html(md.render(text))
        title = _page_title(text, page)
        dest = out / page.replace(".md", ".html")
        dest.write_text(_shell(title, _nav(page), body))
        written.append(dest)

    for modname, label in API_MODULES:
        body = _api_page(modname, label)
        dest = out / "api" / f"{modname}.html"
        dest.write_text(_shell(modname, _nav(f"api/{modname}", depth=1), body, depth=1))
        written.append(dest)
    return written


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", type=Path, default=DOCS / "_site")
    args = ap.parse_args()
    sys.path.insert(0, str(REPO))
    files = build(args.out)
    print(f"built {len(files)} files -> {args.out}")


if __name__ == "__main__":
    main()
