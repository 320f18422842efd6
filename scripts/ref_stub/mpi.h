/* Minimal single-rank MPI stub: enough surface for GraphMat v2.0 run
 * as one process.  Self-sends (SpVec ingest loops over ranks) go
 * through a FIFO message queue matched at Recv/Waitall time. */
#ifndef GM_STUB_MPI_H
#define GM_STUB_MPI_H
#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <deque>
#include <vector>
#include <sys/time.h>

typedef int MPI_Comm;
typedef int MPI_Datatype;   /* encodes element size in bytes */
typedef int MPI_Op;
typedef struct { int count; } MPI_Status;
#define MPI_COMM_WORLD 0
#define MPI_BYTE 1
#define MPI_CHAR 1
#define MPI_INT 4
#define MPI_UNSIGNED 4
#define MPI_UNSIGNED_LONG 8
#define MPI_UNSIGNED_LONG_LONG 8
#define MPI_LONG_LONG 8
#define MPI_LONG 8
#define MPI_DOUBLE 8
#define MPI_FLOAT 4
#define MPI_SUM 0
#define MPI_MAX 1
#define MPI_MIN 2
#define MPI_LAND 3
#define MPI_STATUS_IGNORE ((MPI_Status*)0)
#define MPI_STATUSES_IGNORE ((MPI_Status*)0)
#define MPI_IN_PLACE ((void*)-1)

struct gm_stub_msg { std::vector<char> data; int tag; };
struct gm_stub_pending_recv { void* buf; size_t bytes; int tag; };
/* single-rank: one global queue (all src/dst are rank 0) */
inline std::deque<gm_stub_msg>& gm_stub_q() {
  static std::deque<gm_stub_msg> q; return q;
}
inline std::deque<gm_stub_pending_recv>& gm_stub_rq() {
  static std::deque<gm_stub_pending_recv> q; return q;
}

typedef int MPI_Request;

inline int MPI_Init(int*, char***) { return 0; }
inline int MPI_Finalize() { return 0; }
inline int MPI_Comm_rank(MPI_Comm, int* r) { *r = 0; return 0; }
inline int MPI_Comm_size(MPI_Comm, int* s) { *s = 1; return 0; }
inline int MPI_Barrier(MPI_Comm) { return 0; }
inline double MPI_Wtime() {
  struct timeval tv; gettimeofday(&tv, 0);
  return tv.tv_sec + 1e-6 * tv.tv_usec;
}
inline int MPI_Type_contiguous(int, MPI_Datatype, MPI_Datatype*) { return 0; }
inline int MPI_Type_commit(MPI_Datatype*) { return 0; }
inline int MPI_Allreduce(const void* send, void* recv, int count,
                         MPI_Datatype dt, MPI_Op, MPI_Comm) {
  if (send != MPI_IN_PLACE && send != recv)
    std::memcpy(recv, send, (size_t)count * (size_t)dt);
  return 0;
}
inline int MPI_Bcast(void*, int, MPI_Datatype, int, MPI_Comm) { return 0; }
inline void gm_stub_push(const void* buf, size_t bytes, int tag) {
  gm_stub_msg m; m.tag = tag;
  m.data.assign((const char*)buf, (const char*)buf + bytes);
  gm_stub_q().push_back(m);
  /* satisfy any matching pending Irecv immediately (FIFO) */
  std::deque<gm_stub_pending_recv>& rq = gm_stub_rq();
  for (size_t i = 0; i < rq.size(); i++) {
    if (rq[i].tag == tag || rq[i].tag < 0 || tag < 0) {
      gm_stub_msg& s = gm_stub_q().back();
      size_t n = s.data.size() < rq[i].bytes ? s.data.size() : rq[i].bytes;
      std::memcpy(rq[i].buf, s.data.data(), n);
      gm_stub_q().pop_back();
      rq.erase(rq.begin() + i);
      return;
    }
  }
}
inline int gm_stub_pop(void* buf, size_t bytes, int tag) {
  std::deque<gm_stub_msg>& q = gm_stub_q();
  for (size_t i = 0; i < q.size(); i++) {
    if (q[i].tag == tag || tag < 0) {
      size_t n = q[i].data.size() < bytes ? q[i].data.size() : bytes;
      std::memcpy(buf, q[i].data.data(), n);
      q.erase(q.begin() + i);
      return 0;
    }
  }
  /* no message yet: register as pending (matched by a later send) */
  gm_stub_pending_recv r; r.buf = buf; r.bytes = bytes; r.tag = tag;
  gm_stub_rq().push_back(r);
  return 0;
}
inline int MPI_Send(const void* buf, int count, MPI_Datatype dt, int,
                    int tag, MPI_Comm) {
  gm_stub_push(buf, (size_t)count * (size_t)dt, tag); return 0;
}
inline int MPI_Recv(void* buf, int count, MPI_Datatype dt, int, int tag,
                    MPI_Comm, MPI_Status* st) {
  gm_stub_pop(buf, (size_t)count * (size_t)dt, tag);
  if (st) st->count = count;
  return 0;
}
inline int MPI_Isend(const void* buf, int count, MPI_Datatype dt, int,
                     int tag, MPI_Comm, MPI_Request* req) {
  gm_stub_push(buf, (size_t)count * (size_t)dt, tag);
  if (req) *req = 0;
  return 0;
}
inline int MPI_Irecv(void* buf, int count, MPI_Datatype dt, int, int tag,
                     MPI_Comm, MPI_Request* req) {
  gm_stub_pop(buf, (size_t)count * (size_t)dt, tag);
  if (req) *req = 0;
  return 0;
}
inline int MPI_Waitall(int, MPI_Request*, MPI_Status*) {
  if (!gm_stub_rq().empty()) {
    std::fprintf(stderr, "mpi-stub: unmatched Irecv at Waitall\n");
    std::abort();
  }
  return 0;
}
#endif
