"""(stub — operators added in later milestone)"""
