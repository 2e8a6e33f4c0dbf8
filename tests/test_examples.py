"""Executable documentation: run every python block in docs/EXAMPLES.md
verbatim, top to bottom in one namespace, exactly as a reader would (the
reference's executable-example layer, docs/examples.md there +
PracticalUseCases.scala)."""

import re
from pathlib import Path

EXAMPLES = Path(__file__).parent.parent / "docs" / "EXAMPLES.md"
BLOCKS = re.findall(r"```python\n(.*?)```", EXAMPLES.read_text(), re.S)


def test_examples_found():
    assert len(BLOCKS) == 27


def test_all_example_blocks_run_in_order(spark):
    ns = {"spark": spark}
    for i, block in enumerate(BLOCKS):
        exec(compile(block, f"EXAMPLES.md#block{i + 1}", "exec"), ns)
