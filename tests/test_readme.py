"""The README Quickstart must actually run: extract the first
```python fence from README.md and exec it verbatim, then check the
sink output it promises."""

import os
import re


def test_readme_quickstart_executes(spark):
    readme = open(os.path.join(os.path.dirname(__file__), "..", "README.md")).read()
    (snippet,) = re.findall(r"```python\n(.*?)```", readme, re.S)[:1]
    ns: dict = {}
    exec(compile(snippet, "README.md", "exec"), ns)  # noqa: S102

    q = ns["q"]
    assert not q.isActive  # availableNow run completed
    media = f"{ns['workdir']}/media"
    manifests = [f for f in os.listdir(media) if ".manifest.seg-" in f]
    assert manifests, "quickstart produced no media manifests"
    lines = open(os.path.join(media, manifests[0])).readlines()
    assert lines and all("\t" in l for l in lines)
