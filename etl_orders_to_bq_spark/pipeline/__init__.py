from .orders_pipeline import OrdersEtl

__all__ = ["OrdersEtl"]
