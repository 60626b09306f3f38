# Sphinx configuration for the plumekit docs (reference parity:
# /root/reference/docs/conf.py — the reference ships a sphinx skeleton
# whose pages are empty; plumekit's content lives in the markdown files
# in this directory, and this config makes the tree `make html`-buildable
# wherever sphinx + myst-parser are installed. The build environment here
# deliberately has neither — `make docs` degrades with a message.)

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "plumekit"
copyright = "2026, plumekit"
author = "plumekit"
version = release = "0.1"

# myst-parser renders the existing .md content; autodoc pulls API
# docstrings when building in an environment with the package installed
extensions = []
for _ext in ("myst_parser", "sphinx.ext.autodoc", "sphinx.ext.napoleon",
             "sphinx.ext.viewcode"):
    try:
        __import__(_ext.split(".")[0])
    except ImportError:
        continue
    extensions.append(_ext)

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]
html_theme = "alabaster"
