/* Minimal single-process MPI stub — BENCHMARK GLUE ONLY.
 *
 * Purpose: compile the reference CombBLAS headers (header-only templates)
 * so their LOCAL shared-memory SpGEMM kernel (mtSpGEMM.h) can be timed on
 * this host as a measured baseline for BENCH comparisons.  No distributed
 * path is ever exercised: every collective below is a single-rank identity
 * (self-copy) or a no-op.  This file is not part of the combblas_tpu
 * framework and is never imported by it.
 */
#ifndef MPI_STUB_H
#define MPI_STUB_H

#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <ctime>

typedef int MPI_Comm;
typedef int MPI_Group;
typedef int MPI_Win;
typedef int MPI_Info;
typedef int MPI_Request;
typedef int MPI_Errhandler;
typedef long long MPI_Offset;
typedef long MPI_Aint;
typedef int MPI_File;
typedef int MPI_Op;

/* Datatype carries its size so self-copies work. */
typedef int MPI_Datatype;

typedef struct { int MPI_SOURCE, MPI_TAG, MPI_ERROR; int _count; } MPI_Status;

#define MPI_COMM_WORLD 1
#define MPI_COMM_SELF 2
#define MPI_COMM_NULL 0
#define MPI_GROUP_NULL 0
#define MPI_OP_NULL 0
#define MPI_REQUEST_NULL 0
#define MPI_DATATYPE_NULL 0
#define MPI_INFO_NULL 0
#define MPI_SUCCESS 0
#define MPI_ERR_OTHER 1
#define MPI_MAX_ERROR_STRING 64
#define MPI_IN_PLACE ((void*)-1)
#define MPI_STATUS_IGNORE ((MPI_Status*)0)
#define MPI_STATUSES_IGNORE ((MPI_Status*)0)
#define MPI_UNDEFINED (-32766)
#define MPI_ANY_SOURCE (-1)
#define MPI_ANY_TAG (-1)

/* datatype handles: value = size in bytes (enough for stub self-copies) */
#define MPI_CHAR 1
#define MPI_SIGNED_CHAR 1
#define MPI_UNSIGNED_CHAR 1
#define MPI_BYTE 1
#define MPI_SHORT 2
#define MPI_UNSIGNED_SHORT 2
#define MPI_INT 4
#define MPI_UNSIGNED 4
#define MPI_LONG 8
#define MPI_UNSIGNED_LONG 8
#define MPI_LONG_LONG_INT 8
#define MPI_LONG_LONG 8
#define MPI_UNSIGNED_LONG_LONG 8
#define MPI_FLOAT 4
#define MPI_DOUBLE 8
#define MPI_LONG_DOUBLE 16
#define MPI_WCHAR 4
#define MPI_BOOL 1
#define MPI_CXX_BOOL 1
#define MPI_C_BOOL 1
#define MPI_INT8_T 1
#define MPI_UINT8_T 1
#define MPI_INT16_T 2
#define MPI_UINT16_T 2
#define MPI_INT32_T 4
#define MPI_UINT32_T 4
#define MPI_INT64_T 8
#define MPI_UINT64_T 8

#define MPI_FLOAT_INT 8
#define MPI_DOUBLE_INT 16
#define MPI_LONG_INT 16
#define MPI_2INT 8
#define MPI_SHORT_INT 8
#define MPI_LONG_DOUBLE_INT 24

/* ops */
#define MPI_SUM 101
#define MPI_MAX 102
#define MPI_MIN 103
#define MPI_PROD 104
#define MPI_LAND 105
#define MPI_LOR 106
#define MPI_LXOR 107
#define MPI_BAND 108
#define MPI_BOR 109
#define MPI_BXOR 110
#define MPI_MAXLOC 111
#define MPI_MINLOC 112
#define MPI_REPLACE 113

/* file/window modes */
#define MPI_MODE_RDONLY 2
#define MPI_MODE_WRONLY 4
#define MPI_MODE_CREATE 8
#define MPI_MODE_RDWR 16
#define MPI_MODE_NOCHECK 1024
#define MPI_MODE_NOPRECEDE 2048
#define MPI_MODE_NOPUT 4096
#define MPI_MODE_NOSTORE 8192
#define MPI_MODE_NOSUCCEED 16384
#define MPI_LOCK_SHARED 1
#define MPI_LOCK_EXCLUSIVE 2
#define MPI_SEEK_SET 600
#define MPI_SEEK_CUR 602
#define MPI_SEEK_END 604
#define MPI_DISTRIBUTE_BLOCK 121
#define MPI_ORDER_C 56

typedef void (MPI_User_function)(void*, void*, int*, MPI_Datatype*);

static inline double MPI_Wtime(void) {
    struct timespec ts; clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}
static inline int MPI_Init(int*, char***) { return 0; }
static inline int MPI_Init_thread(int*, char***, int, int* p) { if (p) *p = 3; return 0; }
static inline int MPI_Finalize(void) { return 0; }
static inline int MPI_Finalized(int* f) { *f = 0; return 0; }
static inline int MPI_Initialized(int* f) { *f = 1; return 0; }
static inline int MPI_Abort(MPI_Comm, int code) { exit(code); }
static inline int MPI_Comm_rank(MPI_Comm, int* r) { *r = 0; return 0; }
static inline int MPI_Comm_size(MPI_Comm, int* s) { *s = 1; return 0; }
static inline int MPI_Comm_dup(MPI_Comm c, MPI_Comm* o) { *o = c; return 0; }
static inline int MPI_Comm_free(MPI_Comm*) { return 0; }
static inline int MPI_Comm_split(MPI_Comm c, int, int, MPI_Comm* o) { *o = c; return 0; }
static inline int MPI_Comm_group(MPI_Comm, MPI_Group* g) { *g = 1; return 0; }
static inline int MPI_Comm_create(MPI_Comm c, MPI_Group, MPI_Comm* o) { *o = c; return 0; }
static inline int MPI_Group_incl(MPI_Group, int, const int*, MPI_Group* g) { *g = 1; return 0; }
static inline int MPI_Group_excl(MPI_Group, int, const int*, MPI_Group* g) { *g = 1; return 0; }
static inline int MPI_Group_free(MPI_Group*) { return 0; }
static inline int MPI_Barrier(MPI_Comm) { return 0; }
static inline int MPI_Error_string(int, char* s, int* l) { s[0] = 0; *l = 0; return 0; }
static inline int MPI_Get_count(const MPI_Status* st, MPI_Datatype dt, int* c) {
    *c = st ? st->_count / (dt ? dt : 1) : 0; return 0;
}
static inline int MPI_Type_contiguous(int n, MPI_Datatype dt, MPI_Datatype* o) { *o = n * dt; return 0; }
static inline int MPI_Type_commit(MPI_Datatype*) { return 0; }
static inline int MPI_Type_free(MPI_Datatype*) { return 0; }
static inline int MPI_Type_size(MPI_Datatype dt, int* s) { *s = dt; return 0; }
static inline int MPI_Op_create(MPI_User_function*, int, MPI_Op* op) { *op = 999; return 0; }
static inline int MPI_Op_free(MPI_Op*) { return 0; }

static inline int MPI_stub_copy(const void* s, void* d, int count, MPI_Datatype dt) {
    if (s && d && s != d && s != MPI_IN_PLACE) memcpy(d, s, (size_t)count * (size_t)dt);
    return 0;
}
static inline int MPI_Bcast(void*, int, MPI_Datatype, int, MPI_Comm) { return 0; }
static inline int MPI_Ibcast(void*, int, MPI_Datatype, int, MPI_Comm, MPI_Request* r) { *r = 0; return 0; }
static inline int MPI_Send(const void*, int, MPI_Datatype, int, int, MPI_Comm) { return 0; }
static inline int MPI_Recv(void*, int, MPI_Datatype, int, int, MPI_Comm, MPI_Status*) { return 0; }
static inline int MPI_Sendrecv(const void*, int, MPI_Datatype, int, int, void*, int, MPI_Datatype, int, int, MPI_Comm, MPI_Status*) { return 0; }
static inline int MPI_Isend(const void*, int, MPI_Datatype, int, int, MPI_Comm, MPI_Request* r) { *r = 0; return 0; }
static inline int MPI_Irecv(void*, int, MPI_Datatype, int, int, MPI_Comm, MPI_Request* r) { *r = 0; return 0; }
static inline int MPI_Wait(MPI_Request*, MPI_Status*) { return 0; }
static inline int MPI_Test(MPI_Request*, int* flag, MPI_Status*) { *flag = 1; return 0; }
static inline int MPI_Type_create_struct(int, const int*, const MPI_Aint*, const MPI_Datatype*, MPI_Datatype* o) { *o = 1; return 0; }
static inline int MPI_Get_address(const void* p, MPI_Aint* a) { *a = (MPI_Aint)p; return 0; }
static inline int MPI_Type_get_extent(MPI_Datatype dt, MPI_Aint* lb, MPI_Aint* ext) { *lb = 0; *ext = dt; return 0; }
static inline int MPI_Waitall(int, MPI_Request*, MPI_Status*) { return 0; }
static inline int MPI_Allreduce(const void* s, void* d, int c, MPI_Datatype dt, MPI_Op, MPI_Comm) { return MPI_stub_copy(s, d, c, dt); }
static inline int MPI_Reduce(const void* s, void* d, int c, MPI_Datatype dt, MPI_Op, int, MPI_Comm) { return MPI_stub_copy(s, d, c, dt); }
static inline int MPI_Exscan(const void* s, void* d, int c, MPI_Datatype dt, MPI_Op, MPI_Comm) { if (d) memset(d, 0, (size_t)c * (size_t)dt); return 0; }
static inline int MPI_Scan(const void* s, void* d, int c, MPI_Datatype dt, MPI_Op, MPI_Comm) { return MPI_stub_copy(s, d, c, dt); }
static inline int MPI_Allgather(const void* s, int c, MPI_Datatype dt, void* d, int, MPI_Datatype, MPI_Comm) { return MPI_stub_copy(s, d, c, dt); }
static inline int MPI_Allgatherv(const void* s, int c, MPI_Datatype dt, void* d, const int*, const int* displs, MPI_Datatype dt2, MPI_Comm) {
    return MPI_stub_copy(s, (char*)d + (displs ? (size_t)displs[0] * (size_t)dt2 : 0), c, dt);
}
static inline int MPI_Gather(const void* s, int c, MPI_Datatype dt, void* d, int, MPI_Datatype, int, MPI_Comm) { return MPI_stub_copy(s, d, c, dt); }
static inline int MPI_Gatherv(const void* s, int c, MPI_Datatype dt, void* d, const int*, const int* displs, MPI_Datatype dt2, int, MPI_Comm) {
    return MPI_stub_copy(s, (char*)d + (displs ? (size_t)displs[0] * (size_t)dt2 : 0), c, dt);
}
static inline int MPI_Scatter(const void* s, int c, MPI_Datatype dt, void* d, int, MPI_Datatype, int, MPI_Comm) { return MPI_stub_copy(s, d, c, dt); }
static inline int MPI_Scatterv(const void* s, const int* counts, const int* displs, MPI_Datatype dt, void* d, int, MPI_Datatype, int, MPI_Comm) {
    return MPI_stub_copy((const char*)s + (displs ? (size_t)displs[0] * (size_t)dt : 0), d, counts ? counts[0] : 0, dt);
}
static inline int MPI_Alltoall(const void* s, int c, MPI_Datatype dt, void* d, int, MPI_Datatype, MPI_Comm) { return MPI_stub_copy(s, d, c, dt); }
static inline int MPI_Alltoallv(const void* s, const int* sc, const int* sd, MPI_Datatype dt, void* d, const int* rc, const int* rd, MPI_Datatype dt2, MPI_Comm) {
    return MPI_stub_copy((const char*)s + (sd ? (size_t)sd[0] * (size_t)dt : 0),
                         (char*)d + (rd ? (size_t)rd[0] * (size_t)dt2 : 0),
                         sc ? sc[0] : 0, dt);
}
static inline int MPI_Reduce_scatter(const void* s, void* d, const int* counts, MPI_Datatype dt, MPI_Op, MPI_Comm) { return MPI_stub_copy(s, d, counts ? counts[0] : 0, dt); }

/* one-sided + file APIs: parsed by templates, never exercised single-rank */
static inline int MPI_Win_create(void*, MPI_Aint, int, MPI_Info, MPI_Comm, MPI_Win* w) { *w = 1; return 0; }
static inline int MPI_Win_free(MPI_Win*) { return 0; }
static inline int MPI_Win_fence(int, MPI_Win) { return 0; }
static inline int MPI_Win_lock(int, int, int, MPI_Win) { return 0; }
static inline int MPI_Win_unlock(int, MPI_Win) { return 0; }
static inline int MPI_Win_post(MPI_Group, int, MPI_Win) { return 0; }
static inline int MPI_Win_start(MPI_Group, int, MPI_Win) { return 0; }
static inline int MPI_Win_complete(MPI_Win) { return 0; }
static inline int MPI_Win_wait(MPI_Win) { return 0; }
static inline int MPI_Get(void*, int, MPI_Datatype, int, MPI_Aint, int, MPI_Datatype, MPI_Win) { return 0; }
static inline int MPI_Put(const void*, int, MPI_Datatype, int, MPI_Aint, int, MPI_Datatype, MPI_Win) { return 0; }
static inline int MPI_Info_create(MPI_Info* i) { *i = 1; return 0; }
static inline int MPI_Info_free(MPI_Info*) { return 0; }
static inline int MPI_Info_set(MPI_Info, const char*, const char*) { return 0; }
static inline int MPI_File_open(MPI_Comm, const char*, int, MPI_Info, MPI_File* f) { *f = 0; return 1; }
static inline int MPI_File_close(MPI_File*) { return 0; }
static inline int MPI_File_set_view(MPI_File, MPI_Offset, MPI_Datatype, MPI_Datatype, const char*, MPI_Info) { return 0; }
static inline int MPI_File_read_at(MPI_File, MPI_Offset, void*, int, MPI_Datatype, MPI_Status*) { return 0; }
static inline int MPI_File_read_at_all(MPI_File, MPI_Offset, void*, int, MPI_Datatype, MPI_Status*) { return 0; }
static inline int MPI_File_write(MPI_File, const void*, int, MPI_Datatype, MPI_Status*) { return 0; }
static inline int MPI_File_write_all(MPI_File, const void*, int, MPI_Datatype, MPI_Status*) { return 0; }
static inline int MPI_File_write_at(MPI_File, MPI_Offset, const void*, int, MPI_Datatype, MPI_Status*) { return 0; }
static inline int MPI_File_get_size(MPI_File, MPI_Offset* s) { *s = 0; return 0; }
static inline int MPI_File_seek(MPI_File, MPI_Offset, int) { return 0; }

#endif /* MPI_STUB_H */
