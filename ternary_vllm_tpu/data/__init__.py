from ternary_vllm_tpu.data.llava import LLavaDataset, make_collate_fn, data_loader

__all__ = ["LLavaDataset", "make_collate_fn", "data_loader"]
