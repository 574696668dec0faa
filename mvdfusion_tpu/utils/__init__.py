from mvdfusion_tpu.utils.common import normalize, unnormalize, split_list

__all__ = ["normalize", "unnormalize", "split_list"]
