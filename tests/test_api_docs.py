"""The generated API reference (docs/api/) must exist and stay fresh —
the framework's equivalent of the reference's Doxygen docs (Doxyfile)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_docs_exist_and_fresh(tmp_path):
    api_dir = os.path.join(REPO, "docs", "api")
    assert os.path.exists(os.path.join(api_dir, "index.md"))

    # Regenerate into a scratch dir and compare a representative page: the
    # committed docs must match the live code's signatures/docstrings.
    import importlib
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import gen_api_docs

    text = gen_api_docs.document_module("navierstokes_parallel_tpu.solver")
    committed = open(os.path.join(
        api_dir, "navierstokes_parallel_tpu_solver.md")).read()
    assert text == committed, (
        "docs/api is stale — run `python scripts/gen_api_docs.py`")
