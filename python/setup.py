"""Installable packaging for the graft PySpark wrapper.

Capability parity with the reference's python/setup.py (reference:
python/setup.py:1-40), modernized: metadata lives in pyproject.toml.

With network access, `pip install -e python/` is all you need. This shim
additionally supports fully-offline environments where the `wheel`
package (required by PEP 660 editable builds on setuptools<70) is
unavailable and pip therefore rejects every editable route:

    cd python && python setup.py develop
"""
from setuptools import setup

setup()
