"""Unit tests for the executed stdlib quality gates (scripts/check_quality.py).

The reference gates with black/ruff/pyright (reference pyproject.toml:18-49);
this image ships none of them, so the repo's executed substitute is the
stdlib-AST gate set. These tests pin its behavior: each rule fires on a
seeded defect and stays silent on the tricky-but-legal binding forms the
codebase actually uses.
"""

import os
import sys
import textwrap

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.check_quality import _ast_lint, _undefined_names  # noqa: E402


def _write(tmp_path, name, src):
    p = tmp_path / name
    p.write_text(textwrap.dedent(src))
    return str(p)


class TestUndefinedNames:
    def test_catches_typo(self, tmp_path):
        p = _write(tmp_path, "m.py", """
            def f(x):
                return x + typo_name
        """)
        out = _undefined_names([p])
        assert len(out) == 1 and "typo_name" in out[0]

    def test_clean_on_tricky_bindings(self, tmp_path):
        # every binding form in one file: imports, args, walrus, global,
        # except-as, tuple/for targets, comprehensions, match captures
        p = _write(tmp_path, "ok.py", """
            import os as oz
            from sys import argv

            class C:
                attr = 1
                def m(self, a=1):
                    return oz.path, argv, a, self.attr

            def g():
                global STATE
                STATE = 1
                (w := 3)
                try:
                    pass
                except ValueError as e:
                    print(e)
                for i, (j, k) in []:
                    pass
                lam = lambda q: q + w
                return [v for v in range(3)], lam, i, j, k

            match [1, 2]:
                case [x, *rest]:
                    print(x, rest)
                case {**kw}:
                    print(kw)
                case other:
                    print(other)
        """)
        assert _undefined_names([p]) == []

    def test_wildcard_import_skips_file(self, tmp_path):
        p = _write(tmp_path, "star.py", """
            from os.path import *
            print(join("a", "b"), star_injected_unknown)
        """)
        assert _undefined_names([p]) == []

    def test_dunders_and_builtins_known(self, tmp_path):
        p = _write(tmp_path, "d.py", """
            print(__name__, __file__, len([]), ValueError)
        """)
        assert _undefined_names([p]) == []

    def test_repo_is_clean(self):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        targets = [
            os.path.join(repo, "depth_completion_tpu"),
            os.path.join(repo, "scripts"),
            os.path.join(repo, "bench.py"),
            os.path.join(repo, "__graft_entry__.py"),
        ]
        assert _undefined_names(targets) == []


class TestAstLint:
    @pytest.mark.parametrize(
        "src, marker",
        [
            ("import os\nimport json\nprint(os.sep)\n", "unused import 'json'"),
            ("try:\n    pass\nexcept:\n    pass\n", "bare 'except:'"),
            ("def f(a=[]):\n    return a\n", "mutable default arg"),
            ("d = {'k': 1, 'k': 2}\n", "duplicate dict key"),
        ],
    )
    def test_each_rule_fires(self, tmp_path, src, marker):
        p = _write(tmp_path, "bad.py", src)
        out = _ast_lint([p])
        assert any(marker in f for f in out), out

    def test_all_reexport_not_flagged(self, tmp_path):
        p = _write(tmp_path, "r.py", """
            from os import sep
            __all__ = ["sep"]
        """)
        assert _ast_lint([p]) == []
