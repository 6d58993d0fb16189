"""Bundled fixture data: gazetteer subsets and lexicons.

``cities_fixture.csv`` is the first ~200 rows of the reference's
worldcities gazetteer plus the cities used by the transcript templates
(header and loading semantics per
/root/reference/transner/transner/ner.py:117-119);
``religions_fixture.txt`` is a ~36-line subset of religions.txt
(loaded per ner.py:121-126). Paths are package-relative so the data ships
with ``--py-files``.
"""
