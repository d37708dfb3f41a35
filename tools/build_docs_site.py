#!/usr/bin/env python
"""Build a browsable static HTML documentation site from the ``docs/`` tree.

TPU-image counterpart of the reference's sphinx build
(/root/reference/docs/en/conf.py:1, ``make html``): sphinx/mkdocs are not
installed here (and installs are disallowed), so this renders the existing
markdown tree with the stdlib-adjacent ``markdown`` package + pygments,
producing a sidebar-navigated two-language site.

One command from a clean checkout:

    python tools/build_docs_site.py          # → docs/_site/index.html

Does:
- regenerates ``docs/api.md`` (en) and ``docs/zh_cn/api.md`` via
  tools/gen_api_docs.py,
- renders every ``docs/**/*.md`` (en + zh_cn) to HTML with tables, fenced
  code, TOC anchors and pygments highlighting,
- rewrites relative ``*.md`` links to ``*.html``,
- emits a per-language sidebar (ordered like docs/index.md) and an
  en ⇄ 中文 switcher on pages that exist in both trees.
"""
from __future__ import annotations

import os
import os.path as osp
import re
import shutil
import subprocess
import sys

import markdown
from pygments.formatters import HtmlFormatter

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
DOCS = osp.join(REPO, 'docs')
SITE = osp.join(DOCS, '_site')

EXTENSIONS = ['tables', 'fenced_code', 'codehilite', 'toc', 'sane_lists']
EXT_CFG = {'codehilite': {'guess_lang': False, 'css_class': 'highlight'},
           'toc': {'permalink': False}}

CSS = """
:root { --fg:#1a1a1a; --bg:#ffffff; --accent:#0b5fff; --side:#f5f6f8;
        --border:#e3e5e8; --code:#f6f8fa; }
* { box-sizing: border-box; }
body { margin:0; color:var(--fg); background:var(--bg);
       font:16px/1.6 -apple-system, "Segoe UI", Roboto, "Noto Sans",
       "Noto Sans CJK SC", sans-serif; }
.layout { display:flex; min-height:100vh; }
nav.sidebar { width:280px; flex:none; background:var(--side);
  border-right:1px solid var(--border); padding:1rem 0.75rem 3rem;
  position:sticky; top:0; height:100vh; overflow-y:auto; }
nav.sidebar h1 { font-size:1.05rem; margin:0.25rem 0.5rem 1rem; }
nav.sidebar h2 { font-size:0.78rem; text-transform:uppercase;
  letter-spacing:0.06em; color:#667; margin:1.1rem 0.5rem 0.3rem; }
nav.sidebar a { display:block; padding:0.18rem 0.5rem; border-radius:6px;
  color:var(--fg); text-decoration:none; font-size:0.92rem; }
nav.sidebar a:hover { background:#e9ecf2; }
nav.sidebar a.active { background:var(--accent); color:#fff; }
main { flex:1; min-width:0; padding:2rem 3rem 4rem; max-width:60rem; }
main h1, main h2, main h3 { line-height:1.25; }
main h1 { margin-top:0; }
main a { color:var(--accent); }
main img { max-width:100%; }
pre { background:var(--code); border:1px solid var(--border);
  border-radius:8px; padding:0.8rem 1rem; overflow-x:auto;
  font-size:0.86rem; }
code { background:var(--code); border-radius:4px; padding:0.1em 0.3em;
  font-size:0.9em; }
pre code { background:none; padding:0; }
table { border-collapse:collapse; display:block; overflow-x:auto;
  font-size:0.9rem; }
th, td { border:1px solid var(--border); padding:0.35rem 0.6rem; }
th { background:var(--side); }
.lang-switch { float:right; font-size:0.85rem; }
.lang-switch a { color:var(--accent); text-decoration:none; }
"""

PAGE = """<!DOCTYPE html>
<html lang="{lang}">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — stc_unet_tpu</title>
<style>{css}</style>
<style>{pygments}</style>
</head>
<body>
<div class="layout">
<nav class="sidebar">
<h1><a href="{root}index.html" style="color:inherit;text-decoration:none">
stc_unet_tpu</a></h1>
{nav}
</nav>
<main>
{switch}
{body}
</main>
</div>
</body>
</html>
"""

# sidebar structure per language: (section, [relative md paths])
NAV = [
    ('User guide', ['index.md', 'get_started.md', 'train.md', 'inference.md',
                    'dataset_prepare.md', 'useful_tools.md', 'model_zoo.md',
                    'faq.md', 'tpu_notes.md', 'api.md', 'changelog.md']),
    ('Tutorials', ['tutorials/config.md', 'tutorials/customize_models.md',
                   'tutorials/customize_datasets.md',
                   'tutorials/data_pipeline.md',
                   'tutorials/training_tricks.md',
                   'tutorials/customize_runtime.md']),
    ('Internals', ['design.md', 'perf_analysis.md']),
]


def md_title(path):
    try:
        with open(path, encoding='utf-8') as f:
            for line in f:
                if line.startswith('# '):
                    return line[2:].strip()
    except OSError:
        pass
    return osp.splitext(osp.basename(path))[0]


def rewrite_links(html, depth):
    """Relative *.md links → *.html (anchors preserved)."""
    def sub(m):
        href = m.group(1)
        if href.startswith(('http://', 'https://', '/', '#', 'mailto:')):
            return m.group(0)
        return m.group(0).replace(m.group(1), re.sub(
            r'\.md(?=(#|$))', '.html', href))
    return re.sub(r'<a href="([^"]+)"', sub, html)


def build_nav(tree_root, lang_dir, active_rel, pages):
    """Sidebar HTML for one language tree."""
    out = []
    root_prefix = '../' * active_rel.count('/')
    for section, entries in NAV:
        rows = []
        for rel in entries:
            if rel not in pages:
                continue
            title = pages[rel]
            href = root_prefix + rel[:-3] + '.html'
            cls = ' class="active"' if rel == active_rel else ''
            rows.append(f'<a href="{href}"{cls}>{title}</a>')
        if rows:
            out.append(f'<h2>{section}</h2>' + '\n'.join(rows))
    # anything on disk not in NAV (future docs) gets an extras section
    extras = [rel for rel in sorted(pages)
              if not any(rel in e for _, e in NAV)]
    if extras:
        rows = [f'<a href="{root_prefix + rel[:-3]}.html"'
                f'{" class=" + chr(34) + "active" + chr(34) if rel == active_rel else ""}>'
                f'{pages[rel]}</a>' for rel in extras]
        out.append('<h2>More</h2>' + '\n'.join(rows))
    return '\n'.join(out)


def collect_pages(root):
    pages = {}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames
                       if d not in ('data', '_site', 'zh_cn')]
        for fn in filenames:
            if fn.endswith('.md'):
                rel = osp.relpath(osp.join(dirpath, fn), root)
                pages[rel.replace(os.sep, '/')] = md_title(
                    osp.join(dirpath, fn))
    return pages


def render_tree(src_root, out_root, lang, other_pages, other_href_root):
    pages = collect_pages(src_root)
    md = markdown.Markdown(extensions=EXTENSIONS,
                           extension_configs=EXT_CFG)
    pygments_css = HtmlFormatter().get_style_defs('.highlight')
    for rel, title in pages.items():
        src = osp.join(src_root, rel)
        with open(src, encoding='utf-8') as f:
            text = f.read()
        md.reset()
        body = rewrite_links(md.convert(text), rel.count('/'))
        depth = rel.count('/')
        root = '../' * depth
        switch = ''
        if rel in other_pages:
            target = ('../' * depth + other_href_root + rel[:-3] + '.html')
            label = '中文' if lang == 'en' else 'English'
            switch = (f'<div class="lang-switch">'
                      f'<a href="{target}">{label}</a></div>')
        html = PAGE.format(lang=lang, title=title, css=CSS,
                           pygments=pygments_css, root=root,
                           nav=build_nav(src_root, lang, rel, pages),
                           switch=switch, body=body)
        dst = osp.join(out_root, rel[:-3] + '.html')
        os.makedirs(osp.dirname(dst), exist_ok=True)
        with open(dst, 'w', encoding='utf-8') as f:
            f.write(html)
    return pages


def main():
    # 1) regenerate API pages
    subprocess.run([sys.executable,
                    osp.join(REPO, 'tools', 'gen_api_docs.py')], check=True)
    subprocess.run([sys.executable,
                    osp.join(REPO, 'tools', 'gen_api_docs.py'),
                    '--lang', 'zh'], check=True)
    # 2) render both language trees
    if osp.isdir(SITE):
        shutil.rmtree(SITE)
    en_pages = collect_pages(DOCS)
    zh_pages = collect_pages(osp.join(DOCS, 'zh_cn'))
    render_tree(DOCS, SITE, 'en', zh_pages, 'zh_cn/')
    render_tree(osp.join(DOCS, 'zh_cn'), osp.join(SITE, 'zh_cn'), 'zh',
                en_pages, '../')
    n = sum(len(files) for _, _, files in os.walk(SITE))
    print(f'wrote {n} pages under docs/_site/ '
          f'(open docs/_site/index.html)')


if __name__ == '__main__':
    main()
