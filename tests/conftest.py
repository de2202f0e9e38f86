from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REFERENCE = "/root/reference"


def load_reference_module(relpath: str):
    """Exec a reference source file with torch stubbed out, for use as a
    live parity oracle in tests.  Read-only; returns a namespace dict or
    None when the reference tree is unavailable.

    Trust note: /root/reference is untrusted public content and whole-file
    exec runs its top-level code with test privileges — an intentional
    trade for live bit-exact parity, confined to the test process.  Prefer
    :func:`extract_function` (AST-scoped to one named function) for new
    parity tests; use this only when the oracle needs module-level state.
    """
    path = os.path.join(REFERENCE, relpath)
    if not os.path.exists(path):
        return None
    src = open(path, encoding="utf-8").read()
    src = src.replace("from torch import Tensor", "Tensor = tuple")
    src = src.replace("import torch", "torch = None")
    ns: dict = {}
    try:
        exec(compile(src, path, "exec"), ns)
    except Exception:
        return None
    return ns


def extract_function(relpath: str, name: str):
    """Exec only one top-level function from a reference file (for files
    whose imports can't be satisfied here)."""
    import ast

    path = os.path.join(REFERENCE, relpath)
    if not os.path.exists(path):
        return None
    tree = ast.parse(open(path, encoding="utf-8").read())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            mod = ast.Module(body=[node], type_ignores=[])
            ns: dict = {"Tensor": tuple, "np": __import__("numpy"),
                        "re": __import__("re"), "tmp": ["正面", "中性", "负面"]}
            exec(compile(mod, path, "exec"), ns)
            return ns[name]
    return None


@pytest.fixture(scope="session")
def spark():
    from pytorch_bert_bilstm_crf_ner_spark.plans.session import get_spark

    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
