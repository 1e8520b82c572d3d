"""MOOSE HIT-format input deck parser.

The reference consumes MOOSE ``.i`` decks through the external MOOSE HIT
parser + Action system (reference: src/base/MarlinApp.C:93-172 registers the
syntax).  This is a standalone re-implementation of the subset of HIT that
marlin decks use, so existing decks run unmodified:

- ``[Block]`` .. ``[]`` (or ``[../]``) nesting, ``[sub/block]`` paths
- ``key = value`` params, single/double-quoted (possibly multi-line) strings
- ``#`` comments
- ``${fparse expr}`` and ``${var}`` brace substitution with lexical scoping
- command-line overrides ``path/to/param=value`` and bare ``var=value``
  definitions (used by test specs, e.g. reference test/tests/solvers/tests
  ``cli_args = 'ss=10 cs=0 order=1'``)
"""

from __future__ import annotations

import math
import os
import re
from typing import Dict, List, Optional, Tuple

from .expression import fparse


class HitError(Exception):
    pass


class HitNode:
    """A block in the HIT tree; the root has name ''."""

    def __init__(self, name: str, parent: Optional["HitNode"] = None):
        self.name = name
        self.parent = parent
        self.params: Dict[str, str] = {}
        self.children: Dict[str, "HitNode"] = {}
        self._order: List[Tuple[str, str]] = []  # ('param'|'block', name)

    # -- construction -----------------------------------------------------
    def child(self, name: str, create: bool = False) -> "HitNode":
        node = self
        for part in name.split("/"):
            if part in ("", "."):
                continue
            if part == "..":
                node = node.parent or node
                continue
            if part not in node.children:
                if not create:
                    raise HitError(f"No block '{name}' under '{node.path()}'")
                sub = HitNode(part, node)
                node.children[part] = sub
                node._order.append(("block", part))
            node = node.children[part]
        return node

    def set_param(self, key: str, value: str):
        if key not in self.params:
            self._order.append(("param", key))
        self.params[key] = value

    # -- access -----------------------------------------------------------
    def path(self) -> str:
        parts = []
        node = self
        while node and node.name:
            parts.append(node.name)
            node = node.parent
        return "/".join(reversed(parts))

    def get(self, key: str, default=None) -> Optional[str]:
        return self.params.get(key, default)

    def __contains__(self, key: str) -> bool:
        return key in self.params

    def blocks(self) -> List["HitNode"]:
        """Sub-blocks in deck order, honoring active/inactive params."""
        names = [n for kind, n in self._order if kind == "block"]
        active = self.params.get("active")
        inactive = self.params.get("inactive")
        if active is not None:
            sel = active.split()
            names = [n for n in names if n in sel]
        if inactive is not None:
            sel = inactive.split()
            names = [n for n in names if n not in sel]
        return [self.children[n] for n in names]

    def all_blocks(self) -> List["HitNode"]:
        return [self.children[n] for kind, n in self._order if kind == "block"]

    def render(self, indent: int = 0) -> str:
        pad = "  " * indent
        out = []
        for kind, name in self._order:
            if kind == "param":
                out.append(f"{pad}{name} = {self.params[name]}")
            else:
                out.append(f"{pad}[{name}]")
                out.append(self.children[name].render(indent + 1))
                out.append(f"{pad}[]")
        return "\n".join(x for x in out if x)

    def __repr__(self):
        return f"HitNode({self.path() or '<root>'})"


def _match_brace(text: str, i: int) -> int:
    """Return the index one past the matching '}' of a '${' at position i."""
    assert text[i : i + 2] == "${"
    depth = 0
    j = i
    while j < len(text):
        if text[j : j + 2] == "${":
            depth += 1
            j += 2
            continue
        if text[j] == "}":
            depth -= 1
            j += 1
            if depth == 0:
                return j
            continue
        j += 1
    raise HitError(f"Unbalanced '${{' at offset {i}")


def _tokenize(text: str):
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "[":
            j = text.find("]", i)
            if j < 0:
                raise HitError(f"Unterminated '[' at offset {i}")
            inner = text[i + 1 : j].strip()
            if inner in ("", "..", "../"):
                yield "blockclose", text[i : j + 1]
            else:
                yield "blockopen", text[i : j + 1]
            i = j + 1
            continue
        if c == "=":
            yield "assign", "="
            i += 1
            continue
        if c in "'\"":
            quote = c
            j = i + 1
            while j < n:
                if text[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if text[j] == quote:
                    break
                j += 1
            if j >= n:
                raise HitError(f"Unterminated quote at offset {i}")
            yield ("squote" if quote == "'" else "dquote"), text[i : j + 1]
            i = j + 1
            continue
        # bare token: runs until whitespace/structural char, but ${...}
        # groups (possibly nested, possibly containing spaces) stay intact
        j = i
        while j < n:
            cj = text[j]
            if text[j : j + 2] == "${":
                j = _match_brace(text, j)
                continue
            if cj in " \t\r\n=[]#'\"":
                break
            j += 1
        if j == i:
            raise HitError(f"Cannot tokenize input at offset {i}: {text[i:i+40]!r}")
        yield "bare", text[i:j]
        i = j


def _process_includes(text: str, base_dir: Optional[str]) -> str:
    """Inline `!include path` directives (MOOSE HIT extension; used by
    reference examples/lbm/Rayleigh-Benard/rayleigh-benard.i:26,96)."""
    if "!include" not in text:
        return text
    out_lines = []
    for line in text.splitlines():
        stripped = line.strip()
        if stripped == "!include" or stripped.startswith("!include ") \
                or stripped.startswith("!include\t"):
            rel = stripped[len("!include") :].strip()
            if not rel:
                raise HitError("'!include' directive is missing a file path")
            if base_dir is None:
                raise HitError(f"'!include {rel}' requires a file context")
            path = rel if os.path.isabs(rel) else os.path.join(base_dir, rel)
            with open(path) as f:
                included = _process_includes(f.read(), os.path.dirname(path))
            out_lines.append(included)
        else:
            out_lines.append(line)
    return "\n".join(out_lines)


def parse(text: str, base_dir: Optional[str] = None) -> HitNode:
    text = _process_includes(text, base_dir)
    root = HitNode("")
    node = root
    stack: List[HitNode] = []  # node to return to when the block closes
    tokens = list(_tokenize(text))
    i = 0
    while i < len(tokens):
        kind, tok = tokens[i]
        if kind == "blockopen":
            name = tok[1:-1].strip()
            if name.startswith("./"):
                name = name[2:]
            stack.append(node)
            node = node.child(name, create=True)
            i += 1
        elif kind == "blockclose":
            # '[]' and '[../]' both close the innermost open (a path open
            # like `[TensorComputes/Initialize]` closes fully with one `[]`)
            if not stack:
                raise HitError("Unbalanced block close")
            node = stack.pop()
            i += 1
        elif kind in ("bare", "squote", "dquote"):
            # expect: key = value
            if i + 1 < len(tokens) and tokens[i + 1][0] == "assign":
                key = tok
                if i + 2 >= len(tokens):
                    raise HitError(f"Missing value for parameter '{key}'")
                vkind, vtok = tokens[i + 2]
                if vkind == "squote" or vkind == "dquote":
                    value = vtok[1:-1]
                elif vkind == "bare":
                    value = vtok
                else:
                    raise HitError(f"Bad value for parameter '{key}': {vtok!r}")
                node.set_param(key, value)
                i += 3
            else:
                raise HitError(f"Stray token {tok!r} in block '{node.path()}'")
        else:
            raise HitError(f"Unexpected token {tok!r}")
    if stack:
        raise HitError(f"Unclosed block '{node.path()}'")
    return root


_BRACE_RE = re.compile(r"\$\{([^{}]*)\}")


def _lookup(node: HitNode, name: str, extra: Dict[str, str],
            active=frozenset()):
    """-> (value, defining_node).  ``active`` holds (id(node), name) pairs
    currently being expanded, so a self-referential param like
    `[Executioner] dt = ${dt}` resolves to the ANCESTOR definition
    (MOOSE hit semantics) instead of itself."""
    if name in extra:
        return extra[name], None
    n = node
    while n is not None:
        if name in n.params and (id(n), name) not in active:
            return n.params[name], n
        n = n.parent
    return None, None


def _scalar(value: str) -> float:
    try:
        return float(value)
    except ValueError:
        raise HitError(f"Brace expression operand '{value}' is not numeric")


def expand_braces(root: HitNode, variables: Optional[Dict[str, str]] = None):
    """Expand ``${...}`` substitutions in-place, with lexical scoping."""
    variables = variables or {}

    def expand_value(node: HitNode, value: str, stack=(),
                     active=frozenset()) -> str:
        def repl(m):
            inner = m.group(1).strip()
            if re.match(r"units\s", inner):
                # `${units 10 s}` — value with unit annotation; MOOSE converts
                # to base units, shipped decks only use base units already
                return inner.split()[1]
            if re.match(r"fparse\s", inner):
                exprsrc = inner[len("fparse") :].strip()
                # brace expressions may reference deck variables
                env = {}
                for var in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", exprsrc):
                    if var in ("pi", "e"):
                        continue
                    v, defnode = _lookup(node, var, variables, active)
                    if v is not None:
                        if var in stack:
                            raise HitError(f"Recursive brace expression via '{var}'")
                        v = expand_value(
                            defnode or node, v, stack + (var,),
                            active | ({(id(defnode), var)} if defnode else set()))
                        env[var] = _scalar(v)
                result = fparse(exprsrc, env)
                return _fmt_number(result)
            v, defnode = _lookup(node, inner, variables, active)
            if v is None:
                raise HitError(f"Undefined brace variable '{inner}'")
            if inner in stack:
                raise HitError(f"Recursive brace expression via '{inner}'")
            return expand_value(
                defnode or node, v, stack + (inner,),
                active | ({(id(defnode), inner)} if defnode else set()))

        while _BRACE_RE.search(value):
            value = _BRACE_RE.sub(repl, value)
        return value

    def walk(node: HitNode):
        for key in list(node.params):
            node.params[key] = expand_value(
                node, node.params[key], active={(id(node), key)})
        for sub in node.all_blocks():
            walk(sub)

    walk(root)


def _fmt_number(x: float) -> str:
    if math.isinf(x) or math.isnan(x):
        return repr(x)  # FParser-style 'inf'/'nan' substitution
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


def apply_cli_args(root: HitNode, cli_args: List[str]) -> Dict[str, str]:
    """Apply command-line overrides; returns bare variable definitions.

    ``path/to/param=value`` sets a (possibly new) param deep in the tree;
    ``name=value`` (no slash) defines a substitution variable AND a top-level
    param override, mirroring MOOSE CLI semantics used by the test harness.
    """
    variables: Dict[str, str] = {}
    for arg in cli_args:
        if "=" not in arg:
            raise HitError(f"Malformed command line override '{arg}'")
        key, value = arg.split("=", 1)
        key = key.strip()
        value = value.strip()
        if (value.startswith("'") and value.endswith("'")) or (
            value.startswith('"') and value.endswith('"')
        ):
            value = value[1:-1]
        if "/" in key:
            path, param = key.rsplit("/", 1)
            node = root.child(path, create=True)
            node.set_param(param, value)
        else:
            variables[key] = value
            root.set_param(key, value)
    return variables


def load(path: str, cli_args: Optional[List[str]] = None) -> HitNode:
    """Parse a deck file, apply CLI overrides, and expand brace expressions."""
    with open(path) as f:
        text = f.read()
    root = parse(text, base_dir=os.path.dirname(os.path.abspath(path)))
    variables = apply_cli_args(root, cli_args or [])
    expand_braces(root, variables)
    return root
