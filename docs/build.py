"""Docs build + link check (CI docs job; parity with the reference's
Documentation.yml workflow, /root/reference/.github/workflows/).

Renders every docs/*.md page to docs/_build/*.html and validates:
- intra-docs links point at existing pages/anchors-files;
- `path:line`-style code references name files that exist in the repo.

Usage: python docs/build.py [--strict]
"""

import os
import re
import sys

DOCS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(DOCS)
OUT = os.path.join(DOCS, "_build")

LINK_RE = re.compile(r"\[[^\]]*\]\(([^)#]+)(#[^)]*)?\)")
CODEREF_RE = re.compile(
    r"`((?:genparticlefilters_tpu|tests|scripts|docs)/[A-Za-z0-9_./]+\.(?:py|md))")


def main():
    strict = "--strict" in sys.argv
    errors = []
    pages = sorted(f for f in os.listdir(DOCS) if f.endswith(".md"))
    os.makedirs(OUT, exist_ok=True)

    try:
        import markdown
    except ImportError:
        markdown = None

    for page in pages:
        text = open(os.path.join(DOCS, page)).read()
        for m in LINK_RE.finditer(text):
            target = m.group(1)
            if target.startswith(("http://", "https://", "mailto:")):
                continue
            cand = os.path.normpath(os.path.join(DOCS, target))
            if not os.path.exists(cand):
                errors.append(f"{page}: broken link -> {target}")
        for m in CODEREF_RE.finditer(text):
            path = m.group(1)
            if not os.path.exists(os.path.join(REPO, path)):
                errors.append(f"{page}: stale code reference -> {path}")
        if markdown is not None:
            html = markdown.markdown(text, extensions=["tables",
                                                       "fenced_code"])
            with open(os.path.join(OUT, page[:-3] + ".html"), "w") as f:
                f.write("<meta charset='utf-8'>\n" + html)

    print(f"built {len(pages)} pages -> {OUT}"
          + ("" if markdown else " (markdown module absent: link-check only)"))
    if errors:
        print("\n".join(errors), file=sys.stderr)
        if strict:
            sys.exit(1)
    else:
        print("link check: OK")


if __name__ == "__main__":
    main()
