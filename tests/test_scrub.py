"""Pattern redaction (stages/scrub.py): Python-re parity on PII
presets, rule ordering semantics, count-vs-replace consistency."""

import re

import pyarrow as pa


TEXTS = [
    "contact me at bob@x.com or +1-555-123-4567 ok",
    "no pii here",
    "a.b@mail.co and c@d.org",
    "call 555 123 4567 now; backup 999 888 7777",
    "",
    "edge@case.io.",
]


class TestScrub:
    def test_pii_presets_match_python_re(self, ray_session):
        import ray

        from karta_ray.stages.scrub import (EMAIL_RE, PHONE_RE,
                                            PII_RULES, scrub_text)

        t = pa.table({"doc_id": list(range(len(TEXTS))),
                      "text": TEXTS})
        out = (scrub_text(ray.data.from_arrow(t), PII_RULES)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        for i, text in enumerate(TEXTS):
            n_email = len(re.findall(EMAIL_RE, text))
            after_email = re.sub(EMAIL_RE, "<EMAIL>", text)
            n_phone = len(re.findall(PHONE_RE, after_email))
            clean = re.sub(PHONE_RE, "<PHONE>", after_email)
            row = out.iloc[i]
            assert row.n_email == n_email, text
            assert row.n_phone == n_phone, text
            assert row.text_clean == clean, text

    def test_rules_apply_in_order(self, ray_session):
        import ray

        from karta_ray.stages.scrub import scrub_text

        # second rule must see the first rule's output: "<X>" inserted
        # by rule 1 is matched by rule 2
        rules = [("a", r"foo", "<X>"), ("b", r"<X>!", "DONE")]
        t = pa.table({"text": ["foo! bar foo"]})
        out = scrub_text(ray.data.from_arrow(t), rules).take_all()[0]
        assert out["text_clean"] == "DONE bar <X>"
        assert out["n_a"] == 2 and out["n_b"] == 1

    def test_no_counts_mode(self, ray_session):
        import ray

        from karta_ray.stages.scrub import PII_RULES, scrub_text

        t = pa.table({"text": TEXTS})
        out = scrub_text(ray.data.from_arrow(t), PII_RULES,
                         counts=False)
        assert set(out.schema().names) == {"text", "text_clean"}
