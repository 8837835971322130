"""Vectorized html strip must be bit-identical to the pure spec."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from agentic_doc_ray.stages.html_strip import strip_html_array, strip_html_batch
from agentic_doc_ray.textparse import strip_html

CASES = [
    "",
    "plain text with no markup at all, long enough to keep as a block",
    "<p>short</p>",
    "<p>a paragraph that is comfortably longer than twenty characters</p>",
    "<script>var x = '<p>fake</p>';</script><p>real content that stays here ok</p>",
    "<style>.a{color:red}</style><div>kept content block with enough length</div>",
    "<nav><a href='/'>home</a><a href='/x'>x</a></nav><p>main article body text here</p>",
    "<!-- comment --><p>visible text beyond the twenty character bar</p>",
    "<p><a href='#'>all of this block is one big link text over twenty chars</a></p>",
    "<p>half text half link <a href='#'>link link link link</a> more words here</p>",
    "<SCRIPT src='x'>nested </p> tags</SCRIPT><p>case insensitive handling works</p>",
    "<div>unclosed script <script>never ends... <p>rest eaten</p>",
    "<p>unicode éü content block long enough to keep for sure</p>",
    "<br>line<br>breaks<br> split into many tiny blocks none kept",
    "<table><tr><td>cell one is long enough to keep around</td></tr></table>",
    "text outside tags that is long enough to be kept as its own block",
    "<style><script></style></script><p>interleaved subtree close tags here</p>",
    "<a href='x'>link</a>",
    "<p>\v vertical tab \v whitespace semantics block long enough here</p>",
    "   \n\n  <p>leading whitespace then a real block with enough chars</p>",
]


def test_vec_matches_pure_on_cases():
    got = strip_html_array(pa.array(CASES, pa.string())).to_pylist()
    want = [strip_html(c) for c in CASES]
    for c, g, w in zip(CASES, got, want):
        assert g == w, (c, g, w)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            list("<>/ab cp!-='\"\n\t\v x\u00e9")
            + ["<script>", "</script>", "<p>", "</p>", "<a href='#'>", "</a>", "<br>"]
        ),
        max_size=40,
    ).map("".join)
)
def test_vec_matches_pure_fuzz(s):
    got = strip_html_array(pa.array([s], pa.string())).to_pylist()[0]
    assert got == strip_html(s)


def test_batch_only_touches_html_rows():
    t = pa.Table.from_pydict(
        {
            "doc_id": ["a", "b", "c"],
            "kind": ["text", "html", "text"],
            "text": [
                "untouched one",
                "<p>stripped content block comfortably long enough</p>",
                "untouched two",
            ],
        }
    )
    out = strip_html_batch(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows["a"]["text"] == "untouched one" and rows["a"]["kind"] == "text"
    assert rows["b"]["kind"] == "text"
    assert rows["b"]["text"] == "stripped content block comfortably long enough"
