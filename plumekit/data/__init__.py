"""Dataset-generation entry points.

The reference's README promises ``src/data/make_dataset.py`` ("Scripts to
download or generate data", reference ``README.md:27-33``) but ships only an
empty ``src/data/__init__.py``; plumekit supplies the module
(:mod:`plumekit.data.make_dataset`).
"""
