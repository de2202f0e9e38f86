"""Real-model tagging path (M1: BERT encoder + optional BiLSTM + CRF).

This container ships no torch/transformers, so the class raises a guided
ImportError at construction; the code path is otherwise complete and drops
into the SAME Arrow-batched UDF as the deterministic tagger
(`operators/tagging.py::make_tag_turns_udf(tagger_factory=...)`):

    udf = make_tag_turns_udf(
        tagger_factory=lambda: BertCrfTagger("/models/bert_crf_cner"))

Weight distribution at cluster scale: either (a) an executor-visible model
dir (NFS / object store / `--archives`), loaded lazily ONCE per python
worker by the iterator-UDF pattern, or (b) ``sc.broadcast`` of the
state_dict bytes passed via ``broadcast_state``.  Char-level tokenization
keeps the reference invariant len(tokens) == len(text) so span offsets are
char offsets (`preprocess.py:92-94`).
"""

from __future__ import annotations

from .decode import Span, bioes_decode_flat
from .tags import build_tag_vocab, invert_vocab


class BertCrfTagger:
    """Interface-compatible with ``DeterministicTagger`` (tag_batch)."""

    def __init__(self, model_dir: str, max_seq_len: int = 150,
                 types=None, broadcast_state=None, device: str = "cpu") -> None:
        try:
            import torch  # noqa: F401
            from transformers import BertModel, BertTokenizerFast  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no torch in sandbox
            raise ImportError(
                "BertCrfTagger needs torch + transformers; this sandbox has "
                "neither — use core.model.DeterministicTagger (same decode, "
                "seeded weights) or install the real stack on the cluster"
            ) from exc
        import torch
        from transformers import BertModel, BertTokenizerFast

        self.max_seq_len = max_seq_len
        self.ent2id = build_tag_vocab(types) if types else build_tag_vocab()
        self.id2ent = invert_vocab(self.ent2id)
        self.device = torch.device(device)
        self.tokenizer = BertTokenizerFast.from_pretrained(model_dir)
        self.bert = BertModel.from_pretrained(model_dir).to(self.device).eval()
        num_tags = len(self.ent2id)
        hidden = self.bert.config.hidden_size
        self.classifier = torch.nn.Linear(hidden, num_tags).to(self.device)
        self.crf_start = torch.zeros(num_tags)
        self.crf_end = torch.zeros(num_tags)
        self.crf_trans = torch.zeros(num_tags, num_tags)
        if broadcast_state is not None:
            state = broadcast_state.value if hasattr(broadcast_state, "value") else broadcast_state
            self.load_state(state)

    def load_state(self, state: dict) -> None:
        import torch

        self.classifier.load_state_dict(
            {k.split("classifier.")[-1]: v for k, v in state.items() if "classifier" in k}
        )
        self.crf_start = torch.as_tensor(state["crf.start_transitions"])
        self.crf_end = torch.as_tensor(state["crf.end_transitions"])
        self.crf_trans = torch.as_tensor(state["crf.transitions"])

    def tag_batch(self, texts: list[str]) -> list[list[Span]]:
        import numpy as np
        import torch

        from .viterbi import viterbi_decode_batch

        out: list[list[Span]] = [[] for _ in texts]
        keep = [(i, t) for i, t in enumerate(texts) if t]
        if not keep:
            return out
        idxs, batch_texts = zip(*keep)
        enc = self.tokenizer(
            [list(t) for t in batch_texts],
            is_split_into_words=True,
            padding=True,
            truncation=True,
            max_length=self.max_seq_len,
            return_tensors="pt",
        ).to(self.device)
        with torch.no_grad():
            hidden = self.bert(**enc).last_hidden_state
            logits = self.classifier(hidden).cpu().numpy()
        lengths = np.minimum(
            [len(t) for t in batch_texts], self.max_seq_len - 2
        )
        # strip [CLS] (the pred[1:1+len(text)] slice, main.py:104)
        em = logits[:, 1 : 1 + int(lengths.max()), :]
        paths = viterbi_decode_batch(
            em,
            np.asarray(lengths),
            self.crf_start.numpy(),
            self.crf_trans.numpy(),
            self.crf_end.numpy(),
        )
        for row, text, seq in zip(idxs, batch_texts, paths):
            out[row] = bioes_decode_flat(seq, text[: len(seq)], self.id2ent)
        return out
