from dhg.data.tokenizer import Tokenizer  # noqa: F401
